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
    """torch state_dict (tensors or arrays) -> lirec_tpu params pytree."""
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for name, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        base, kind = name.rsplit(".", 1)
        if base == "gates_ints.fc_out":
            base = "gates_ints"
        if kind == "weight":
            params.setdefault(base, {})["kernel"] = arr.T.copy()
        elif kind == "bias":
            params.setdefault(base, {})["bias"] = arr
        else:
            raise ValueError("unexpected checkpoint entry %r" % name)
    return params


def load_torch_checkpoint(path: str) -> Tuple[Dict, Dict]:
    """Load a .pth.tar file -> (params pytree, metadata incl. epoch).

    Uses torch's unpickler (CPU map) when available; the released
    checkpoints predate the weights_only format so full unpickling is
    required (ref utils/util_functions.py:274-281).
    """
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("state_dict", checkpoint)
    meta = {
        "epoch": checkpoint.get("epoch") if isinstance(checkpoint, dict) else None,
        "has_optimizer": isinstance(checkpoint, dict)
        and "optimizer" in checkpoint,
    }
    return params_from_torch_state_dict(state_dict), meta
