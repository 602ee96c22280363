"""lirec-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Annusha/LIReC (CVPR 2020): multi-task interaction /
relationship / character-grounding recognition over precomputed multimodal
MovieGraphs features.

See ARCHITECTURE.md for the layer map and SURVEY.md for the structural
analysis of the reference implementation this framework re-designs.
"""

__version__ = "0.1.0"

from lirec_tpu import config as config  # noqa: F401
