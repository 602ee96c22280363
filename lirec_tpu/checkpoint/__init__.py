from lirec_tpu.checkpoint.saver import (  # noqa: F401
    BestNSaver,
    load_params,
    save_params,
    load_train_state,
    save_train_state,
)
from lirec_tpu.checkpoint.torch_import import (  # noqa: F401
    params_from_torch_state_dict,
    load_torch_checkpoint,
)
