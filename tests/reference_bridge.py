"""Test-facing alias of the reference-import machinery.

The actual implementation lives in `lirec_tpu.compat.reference` since r4
(the `convert-checkpoint --verify` CLI needs it at runtime, SURVEY.md
§7.5); tests keep importing it under the historical name.
"""

from lirec_tpu.compat.reference import (  # noqa: F401
    REFERENCE,
    ShimDiGraph,
    configure_opt,
    first_element_choice,
    import_reference,
    legacy_byte_masks,
    reference_available,
    transplant_params,
    write_mg_pickle,
)
