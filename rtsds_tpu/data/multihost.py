"""Multi-host input pipeline: per-host shards of every GLOBAL batch,
assembled into mesh-sharded ``jax.Array``s.

The reference's entire distributed story is single-process
``nn.DataParallel`` (``/root/reference/utils.py:104-105``); the TPU-native
equivalent at real scale (SURVEY.md §5.8) is: every host seeds the SAME
permutation RNG, so all hosts agree on the global sample order; each host
decodes only its contiguous 1/process_count slice of every global batch;
``jax.make_array_from_process_local_data`` stitches the local shards into
one global batch-sharded array without any cross-host data movement (each
device already holds exactly the samples it will compute on).

Single-process semantics are the identity: the "global" batch is the local
one, so the same code path runs everywhere (and is what
``__graft_entry__.dryrun_multichip`` exercises).
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

from rtsds_tpu.data.pipeline import DataLoader


class MultiHostDataLoader(DataLoader):
    """Per-host view of a globally-shuffled batch stream.

    ``batch_size`` below is the GLOBAL batch size; each host stacks only
    ``global / process_count`` samples per step.  All hosts must construct
    this with the same ``seed`` (they draw the same permutations).
    ``process_index``/``process_count`` default to the JAX runtime values
    and are overridable for tests that simulate several hosts in one
    process.
    """

    def __init__(self, dataset, global_batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, infinite: bool = False,
                 process_index: int | None = None,
                 process_count: int | None = None):
        pc = jax.process_count() if process_count is None else process_count
        pi = jax.process_index() if process_index is None else process_index
        if global_batch_size % pc != 0:
            raise ValueError(
                f"global batch {global_batch_size} must divide evenly over "
                f"{pc} processes")
        super().__init__(dataset, batch_size=global_batch_size // pc,
                         shuffle=shuffle, num_workers=num_workers, seed=seed,
                         drop_last=drop_last, prefetch=prefetch,
                         infinite=infinite)
        self.global_batch_size = global_batch_size
        self.process_index = pi
        self.process_count = pc

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return -(-n // self.global_batch_size)

    def _batch_indices(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        local = self.batch_size
        lo, hi = self.process_index * local, (self.process_index + 1) * local
        while True:
            order = self._order(n)
            self._epoch += 1
            stop = n - (n % self.global_batch_size)
            if not self.drop_last and stop < n:
                stop = n  # ragged tail: every host truncates consistently
            for i in range(0, stop, self.global_batch_size):
                g = order[i:i + self.global_batch_size]
                # skips count GLOBAL groups, so every process fast-forwards
                # past the same groups even when its own chunk of a ragged
                # tail is empty (cross-host deterministic-resume guarantee)
                if self._skip > 0:
                    self._skip -= 1
                    continue
                chunk = g[lo:hi]
                if len(chunk) == 0:
                    continue  # ragged tail smaller than this host's offset
                yield chunk
            if not self.infinite:
                return


def global_batches(loader: MultiHostDataLoader, sharding,
                   transform=None, key=None, augment: bool = False):
    """Host shards -> global mesh-sharded jax.Arrays (-> fused transform).

    ``sharding`` is the batch NamedSharding over the full (multi-host) mesh.
    Each per-host numpy shard becomes its processes' span of the global
    array via ``jax.make_array_from_process_local_data`` -- no gather, no
    re-shuffle: device placement IS the distribution.
    """
    pc = loader.process_count
    for i, (images, labels) in enumerate(loader):
        g_images = jax.make_array_from_process_local_data(
            sharding, images, (images.shape[0] * pc, *images.shape[1:]))
        g_labels = jax.make_array_from_process_local_data(
            sharding, labels, (labels.shape[0] * pc, *labels.shape[1:]))
        if transform is None:
            yield g_images, g_labels
        elif augment and key is not None:
            yield transform(g_images, g_labels, jax.random.fold_in(key, i))
        else:
            yield transform(g_images, g_labels)
