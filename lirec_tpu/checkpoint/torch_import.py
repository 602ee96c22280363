"""Import released PyTorch checkpoints (ref `models_release/*.pth.tar`).

The reference stores ``{'epoch', 'state_dict', 'optimizer'}`` pickles (ref
`mlp/train.py:99-106`). Conversion maps each ``<name>.weight [out, in]`` to
``params[<name>]['kernel'] [in, out]`` and biases verbatim; the GatingUnit's
nested ``gates_ints.fc_out.*`` flattens to ``params['gates_ints']``
(ref mlp/model.py:342-354).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["params_from_torch_state_dict", "load_torch_checkpoint"]


def params_from_torch_state_dict(state_dict: Dict) -> Dict:
    """torch state_dict (tensors or arrays) -> lirec_tpu params pytree.

    Tolerates ``module.``-prefixed keys (DataParallel wrapping) and skips
    non-tensor buffers; anything else malformed fails with a descriptive
    error rather than an unpacking traceback.
    """
    import sys

    params: Dict[str, Dict[str, np.ndarray]] = {}
    for name, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        if not hasattr(value, "shape"):  # non-tensor buffer (e.g. a counter)
            print(
                "torch_import: skipping non-tensor entry %r" % name,
                file=sys.stderr,
            )
            continue
        arr = np.asarray(value, dtype=np.float32)
        if name.startswith("module."):
            name = name[len("module."):]
        if "." not in name:
            raise ValueError("unexpected checkpoint entry %r" % name)
        base, kind = name.rsplit(".", 1)
        if base == "gates_ints.fc_out":
            base = "gates_ints"
        if kind == "weight":
            params.setdefault(base, {})["kernel"] = arr.T.copy()
        elif kind == "bias":
            params.setdefault(base, {})["bias"] = arr
        elif kind in ("num_batches_tracked", "running_mean", "running_var"):
            print(
                "torch_import: skipping buffer entry %r" % name,
                file=sys.stderr,
            )
        else:
            raise ValueError("unexpected checkpoint entry %r" % name)
    return params


def load_torch_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Load a .pth.tar file -> (params pytree, metadata incl. epoch).

    Uses torch's unpickler (CPU map) when available; the released
    checkpoints predate the weights_only format so full unpickling is
    required (ref utils/util_functions.py:274-281). Without a torch
    install, falls back to the pure-Python reader (pickle_reader.py) so
    conversion works on torch-free TPU hosts.
    """
    try:
        import torch
    except ImportError:
        from lirec_tpu.checkpoint.pickle_reader import read_pth_tar

        checkpoint = read_pth_tar(path)
    else:
        checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("state_dict", checkpoint)
    meta = {
        "epoch": checkpoint.get("epoch") if isinstance(checkpoint, dict) else None,
        "has_optimizer": isinstance(checkpoint, dict)
        and "optimizer" in checkpoint,
    }
    return params_from_torch_state_dict(state_dict), meta
