"""Batching and iteration over `InteractionDataset`.

Replaces the reference's `torch.utils.data.DataLoader` usage (ref
`mlp/train.py:33-37`, `mlp/test.py:18-22`) with a simple host-side iterator:
samples are index tensors + labels (tiny), so there is no need for worker
processes — batch assembly is a few `np.stack`s, and the heavy gather to
dense features happens **on device** inside jit (see models/*).
"""

from __future__ import annotations

from typing import Dict, Iterator, List

import numpy as np

__all__ = ["collate", "BatchIterator", "prefetch_to_device"]


def prefetch_to_device(iterator, size: int = 2):
    """Stage host batches onto the device `size` steps ahead, overlapping
    H2D transfer with compute (the packed batches are tiny — int32 index
    tensors — so this is latency hiding, not bandwidth)."""
    import collections

    import jax

    queue = collections.deque()
    it = iter(iterator)
    try:
        while len(queue) < size:
            queue.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield batch


def collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into batch arrays (default-collate style)."""
    out: Dict[str, np.ndarray] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = np.asarray(vals[0])
        if first.dtype == bool:
            out[key] = np.asarray(vals, dtype=bool)
        elif first.dtype.kind in "iu":
            out[key] = np.stack([np.asarray(v) for v in vals]).astype(np.int32)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals]).astype(np.float32)
    return out


class BatchIterator:
    """Shuffling batch iterator with per-epoch RNG.

    Train mode reshuffles and re-randomizes context subsampling each epoch
    (the reference resamples inside `__getitem__`; here `dataset.__getitem__`
    receives an explicit per-epoch Generator).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        dense: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.dense = dense
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        # eval fast path: slice the materialized split instead of per-sample
        # Python assembly (train mode needs fresh per-epoch randomness)
        materialized = None
        if (
            len(order) > 0
            and not self.shuffle
            and not self.dense
            and getattr(self.dataset, "mode", "train") != "train"
            and hasattr(self.dataset, "materialize")
            and not getattr(self.dataset, "test_rels_multi_clip", False)
        ):
            materialized = self.dataset.materialize()
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            if materialized is not None:
                yield {k: v[chunk] for k, v in materialized.items()}
                continue
            samples = [self.dataset.__getitem__(int(i), rng) for i in chunk]
            if self.dense:
                samples = [self.dataset.to_dense(s) for s in samples]
            yield collate(samples)
        self.epoch += 1
