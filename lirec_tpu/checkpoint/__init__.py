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


def save_train_state_any(path, params, opt_state, epoch,
                         backend: str = "msgpack") -> None:
    """Backend-dispatched train-state save. 'msgpack' writes one flax file;
    'orbax' writes an Orbax directory (atomic, sharded-array aware — the
    production multi-host backend)."""
    if backend == "orbax":
        from lirec_tpu.checkpoint import orbax_backend

        orbax_backend.save(path, params, opt_state=opt_state, epoch=epoch)
    elif backend == "msgpack":
        save_train_state(path, params, opt_state, epoch)
    else:
        raise ValueError("unknown checkpoint backend %r" % backend)


def load_train_state_any(path, params_template, opt_template):
    """Restore (params, opt_state, epoch) from either backend — Orbax
    checkpoints are directories, msgpack ones are files."""
    import os

    if os.path.isdir(path):
        from lirec_tpu.checkpoint import orbax_backend

        return orbax_backend.restore(path, params_template, opt_template)
    return load_train_state(path, params_template, opt_template)
