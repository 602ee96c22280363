from lirec_tpu.models.layers import DropoutRng, init_linear, linear  # noqa: F401
from lirec_tpu.models.spec import ModelSpec  # noqa: F401
from lirec_tpu.models.modalities import (  # noqa: F401
    init_modalities,
    modalities_forward,
)
from lirec_tpu.models.midfusion import (  # noqa: F401
    init_midfusion,
    midfusion_forward,
    midfusion_maxtracks_forward,
)
from lirec_tpu.models.factory import create_model  # noqa: F401
