from lirec_tpu.checkpoint.saver import BestNSaver, load_params, save_params  # noqa: F401
from lirec_tpu.checkpoint.torch_import import (  # noqa: F401
    params_from_torch_state_dict,
    load_torch_checkpoint,
)
