"""Checkpoint persistence: best-n-per-metric policy + msgpack serialization.

`BestNSaver` reproduces the reference `ModelSaver` policy (ref
`utils/model_saver.py`): keep the best ``n=4`` checkpoints **per metric
key** ('total'/'ints'/'rels'/'tracks'/'joint'), evict the worst, GC stale
files named ``v%.4f_ep%d``. Serialization uses flax msgpack (pytree-safe,
framework-native) instead of Python pickles.
"""

from __future__ import annotations

import json
import os
import os.path as ops
from collections import defaultdict
from typing import Dict, Optional

from flax import serialization

__all__ = ["save_params", "load_params", "BestNSaver"]


def save_params(path: str, params: Dict, extra: Optional[Dict] = None) -> None:
    os.makedirs(ops.dirname(ops.abspath(path)), exist_ok=True)
    payload = {"params": params}
    if extra:
        payload["extra"] = extra
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_params(path: str, template: Optional[Dict] = None) -> Dict:
    with open(path, "rb") as f:
        raw = f.read()
    tree = serialization.msgpack_restore(raw)
    params = tree["params"]
    if template is not None:
        return serialization.from_state_dict(template, params)
    return params


def save_train_state(path: str, params: Dict, opt_state, epoch: int) -> None:
    """Weights + optimizer state + epoch, for resume_train
    (ref mlp/train.py:99-106 checkpoint contents)."""
    os.makedirs(ops.dirname(ops.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(
            serialization.to_bytes(
                {"params": params, "opt_state": opt_state, "epoch": epoch}
            )
        )


def load_train_state(path: str, params_template: Dict, opt_template):
    """Restore (params, opt_state, epoch) against templates
    (ref utils/util_functions.py:274-291)."""
    with open(path, "rb") as f:
        raw = f.read()
    tree = serialization.msgpack_restore(raw)
    params = serialization.from_state_dict(params_template, tree["params"])
    opt_state = serialization.from_state_dict(opt_template, tree["opt_state"])
    return params, opt_state, int(tree.get("epoch", 0))


class BestNSaver:
    """Best-n checkpoints per metric key (ref utils/model_saver.py:17-64)."""

    def __init__(self, path: str = "", n: int = 4):
        self.n = n
        self.path = path
        self.eval: Dict[str, Dict[int, float]] = defaultdict(dict)
        self.models: Dict[str, Dict[int, Dict]] = defaultdict(dict)
        self.worst_idx: Dict[str, int] = defaultdict(lambda: -1)
        self.saved: Dict[str, Dict[int, str]] = defaultdict(dict)
        if path:
            os.makedirs(path, exist_ok=True)

    def check(self, val: Dict[str, float]) -> bool:
        """True if any metric improves on its current worst kept value
        (ref :31-35)."""
        for key in val:
            if len(self.eval[key]) < self.n:
                return True
            if val[key] > self.eval[key][self.worst_idx[key]]:
                return True
        return False

    def update(self, val: Dict[str, float], save_dict: Dict, epoch: int) -> None:
        for key in val:
            self.eval[key][epoch] = val[key]
            self.models[key][epoch] = save_dict
            if len(self.eval[key]) > self.n:
                self.eval[key].pop(self.worst_idx[key])
                self.models[key].pop(self.worst_idx[key])
                self.saved[key].pop(self.worst_idx[key], None)
            worst = val[key]
            self.worst_idx[key] = epoch
            for epoch_other, val_other in self.eval[key].items():
                if val_other <= worst:
                    worst = val_other
                    self.worst_idx[key] = epoch_other
            assert len(self.eval[key]) <= self.n

    def save(self) -> None:
        """Write kept checkpoints under <path>/<key>/, GC stale files
        (ref :53-64)."""
        for key in self.eval:
            key_dir = ops.join(self.path, key)
            os.makedirs(key_dir, exist_ok=True)
            kept = set(self.saved[key].values())
            for filename in os.listdir(key_dir):
                full = ops.join(key_dir, filename)
                if full not in kept:
                    os.remove(full)
            for epoch, val in self.eval[key].items():
                full = ops.join(key_dir, "v%.4f_ep%d.ckpt" % (val, epoch))
                if full not in kept:
                    self.saved[key][epoch] = full
                    save_dict = self.models[key][epoch]
                    save_params(
                        full,
                        save_dict["params"],
                        extra={"epoch": save_dict.get("epoch", epoch)},
                    )
        with open(ops.join(self.path, "index.json"), "w") as f:
            json.dump(
                {k: {str(e): v for e, v in d.items()} for k, d in self.eval.items()},
                f,
                indent=2,
            )
