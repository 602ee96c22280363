"""Batching and iteration over `InteractionDataset`.

Replaces the reference's `torch.utils.data.DataLoader` usage (ref
`mlp/train.py:33-37`, `mlp/test.py:18-22`) with a simple host-side iterator:
samples are index tensors + labels (tiny), so there is no need for worker
processes — batch assembly is a few `np.stack`s, and the heavy gather to
dense features happens **on device** inside jit (see models/*).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List

import numpy as np

__all__ = ["collate", "BatchIterator", "prefetch_to_device", "AssemblyPool"]


_POOL_DATASET = None


def _pool_init(dataset):
    global _POOL_DATASET
    _POOL_DATASET = dataset


def _pool_probe(_):
    return _POOL_DATASET is not None


def _probe_target():
    return None


def _pool_assemble_batch(args):
    return _assemble_batch_with(_POOL_DATASET, args)


def _assemble_batch_with(dataset, args):
    """One collated batch from per-sample PRNG streams ((seed, epoch, i))
    — execution-order and process-placement independent."""
    idxs, seed, epoch = args
    return collate([
        dataset.__getitem__(
            int(i), np.random.default_rng((seed, epoch, int(i)))
        )
        for i in idxs
    ])


class AssemblyPool:
    """Worker processes for per-sample batch assembly.

    The reference ran its DataLoader with ``num_workers=4``
    (ref mlp/train.py:33-37) because per-sample Python assembly was its
    bottleneck; the packed design shrank each sample to index tensors but
    the ~0.1 ms/sample Python cost remains — at real-data scale it rivals
    the 5 ms device step per epoch. Workers cut it by ~n_workers with
    bitwise-identical output: every sample draws from its own
    ``default_rng((seed, epoch, i))`` stream, so assembly is independent
    of execution order and of which process runs it (the serial
    ``workers`` path uses the same per-sample streams).

    Uses the 'spawn' context (fork is unsafe with a live JAX runtime) and
    strips the TPU-attach bootstrap from the workers' environment — they
    only ever run numpy.
    """

    def __init__(self, dataset, workers: int, probe_timeout: float = 120.0):
        import multiprocessing as mp
        import os

        ctx = mp.get_context("spawn")
        saved = {
            k: os.environ.pop(k, None)
            for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
        }
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            # spawn re-imports __main__: with a non-importable parent
            # (stdin scripts, notebooks, unguarded scripts) children die
            # at bootstrap — and a Pool would RESPAWN them forever, then
            # deadlock in terminate(). Probe with a single bare Process
            # FIRST: a dead bootstrap exits nonzero with no respawn
            # machinery, and the caller falls back to inline assembly.
            probe = ctx.Process(target=_probe_target, daemon=True)
            probe.start()
            probe.join(probe_timeout)
            if probe.is_alive():
                probe.kill()
                probe.join(5)
                raise RuntimeError("spawn probe timed out")
            if probe.exitcode != 0:
                raise RuntimeError(
                    "worker bootstrap failed (exit %s) — is the launching "
                    "script importable and main-guarded?" % probe.exitcode
                )
            self._pool = ctx.Pool(
                workers, initializer=_pool_init, initargs=(dataset,)
            )
            self._pool.map_async(_pool_probe, [0]).get(timeout=probe_timeout)
        except BaseException:
            pool = getattr(self, "_pool", None)
            if pool is not None:
                pool.terminate()
            raise
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def assemble_batches(self, tasks, timeout: float = 600.0):
        """tasks: [(idx_list, seed, epoch)] -> generator of collated batch
        dicts, in order (imap: batches stream back as workers finish).

        Each result waits at most ``timeout`` seconds: a worker killed
        mid-task (OOM) loses its in-flight result and a plain imap would
        block forever. Note a RESPAWNED worker boots with the parent's
        restored environment (the TPU-attach bootstrap registers, though
        workers never initialize a jax backend — they only run numpy);
        the timeout turns the lost-result case into a clear error."""
        it = self._pool.imap(_pool_assemble_batch, tasks)
        for _ in range(len(tasks)):
            yield it.next(timeout)

    def close(self) -> None:
        self._pool.terminate()
        self._pool.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


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
        workers: int = 0,
        fast_assembly: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.dense = dense
        # every assembly path draws from per-sample PRNG streams
        # default_rng((seed, epoch, i)) — execution-order independent, so
        # any worker count (0 = in-process, N = AssemblyPool, and the
        # inline fallback on pool failure) yields identical batches
        self.workers = workers
        # plan-based whole-epoch assembly (data/plan.py): bitwise-identical
        # to the per-sample path, ~100x faster; default-on wherever the
        # dataset supports it (LIREC_TPU_NO_PLAN=1 opts out globally)
        self.fast_assembly = fast_assembly and not os.environ.get(
            "LIREC_TPU_NO_PLAN"
        )
        self._pool = None
        self.epoch = 0

    def _epoch_batches(self, order):
        """Collated batches via the worker pool (falls back inline —
        unpicklable dataset, non-importable __main__ — with identical
        output: same per-sample PRNG streams either way)."""
        tasks = [
            ([int(i) for i in order[s : s + self.batch_size]],
             self.seed, self.epoch)
            for s in range(0, len(order), self.batch_size)
        ]
        if self._pool is None:
            try:
                self._pool = AssemblyPool(self.dataset, self.workers)
            except Exception as err:
                import warnings

                warnings.warn(
                    "assembly worker pool unavailable (%s: %s); assembling "
                    "in-process — identical batches, no parallel speedup"
                    % (type(err).__name__, err)
                )
                self._pool = False
        if self._pool:
            return self._pool.assemble_batches(tasks)
        return (_assemble_batch_with(self.dataset, t) for t in tasks)

    def close(self) -> None:
        if self._pool:
            self._pool.close()
        self._pool = None

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
        plan = None
        if (
            materialized is None
            and not self.dense
            and self.fast_assembly
            and not getattr(self.dataset, "test_rels_multi_clip", False)
            and hasattr(self.dataset, "assembly_plan")
        ):
            plan = self.dataset.assembly_plan()
        if plan is not None:
            if self.drop_last:
                order = order[: (len(order) // self.batch_size) * self.batch_size]
            epoch_data = plan.assemble(order, self.seed, self.epoch)
            for start in range(0, len(order), self.batch_size):
                yield {
                    k: v[start : start + self.batch_size]
                    for k, v in epoch_data.items()
                }
            self.epoch += 1
            return
        if self.workers and not self.dense and materialized is None:
            if self.drop_last:
                order = order[: (len(order) // self.batch_size) * self.batch_size]
            yield from self._epoch_batches(order)
            self.epoch += 1
            return
        for start in range(0, len(order), self.batch_size):
            chunk = order[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            if materialized is not None:
                yield {k: v[chunk] for k, v in materialized.items()}
                continue
            # per-sample PRNG streams ((seed, epoch, i)) — the SAME streams
            # the worker pool uses, so every workers= value (0 included)
            # yields bitwise-identical batches
            samples = [
                self.dataset.__getitem__(
                    int(i), np.random.default_rng((self.seed, self.epoch, int(i)))
                )
                for i in chunk
            ]
            if self.dense:
                samples = [self.dataset.to_dense(s) for s in samples]
            yield collate(samples)
        self.epoch += 1
