"""Multi-host input pipeline (SURVEY.md §5.8, VERDICT round-1 gap #3).

Simulates several hosts inside one process: each simulated host builds a
MultiHostDataLoader with the same seed and its own process_index; the
concatenation of their per-host shards must equal the single-host loader's
global batches, sample for sample.  The jax.Array assembly path
(``make_array_from_process_local_data``) is exercised on the 8-device CPU
mesh.
"""

import jax
import numpy as np

from rtsds_tpu.data.multihost import MultiHostDataLoader, global_batches
from rtsds_tpu.data.synthetic import SyntheticSegDataset
from rtsds_tpu.parallel.mesh import batch_sharding, make_mesh


def _collect(loader, n=None):
    out = []
    for i, b in enumerate(loader):
        out.append(b)
        if n is not None and i + 1 >= n:
            break
    return out


def test_per_host_shards_reassemble_global_batches():
    ds = SyntheticSegDataset(24, (16, 24), 5, seed=0)
    global_bs, pc = 8, 4

    single = MultiHostDataLoader(ds, global_bs, shuffle=True, seed=7,
                                 num_workers=2, process_index=0,
                                 process_count=1)
    hosts = [MultiHostDataLoader(ds, global_bs, shuffle=True, seed=7,
                                 num_workers=2, process_index=p,
                                 process_count=pc) for p in range(pc)]

    global_batches_ = _collect(single)
    per_host = [_collect(h) for h in hosts]
    assert len(global_batches_) == 3  # 24 / 8
    for b_idx, (g_img, g_lbl) in enumerate(global_batches_):
        img = np.concatenate([per_host[p][b_idx][0] for p in range(pc)])
        lbl = np.concatenate([per_host[p][b_idx][1] for p in range(pc)])
        np.testing.assert_array_equal(img, g_img)
        np.testing.assert_array_equal(lbl, g_lbl)


def test_host_shards_are_disjoint_and_cover_epoch():
    ds = SyntheticSegDataset(12, (8, 12), 3, seed=1)
    pc, global_bs = 2, 4
    seen = []
    for p in range(pc):
        loader = MultiHostDataLoader(ds, global_bs, shuffle=True, seed=3,
                                     num_workers=1, process_index=p,
                                     process_count=pc)
        for idxs in loader._batch_indices():
            seen.extend(idxs.tolist())
    assert sorted(seen) == list(range(12))  # disjoint cover, no repeats


def test_global_batch_size_must_divide():
    ds = SyntheticSegDataset(8, (8, 12), 3, seed=0)
    try:
        MultiHostDataLoader(ds, 5, process_index=0, process_count=2)
    except ValueError as e:
        assert "divide" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_global_batches_assemble_sharded_arrays():
    """Single-process path of make_array_from_process_local_data over the
    8-device mesh: content equals the host batch; sharding is batch-dim."""
    ds = SyntheticSegDataset(16, (16, 24), 5, seed=0)
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    loader = MultiHostDataLoader(ds, 8, shuffle=False, seed=0, num_workers=2)

    host = _collect(MultiHostDataLoader(ds, 8, shuffle=False, seed=0,
                                        num_workers=2))
    dev = _collect(global_batches(loader, sharding))
    assert len(dev) == len(host) == 2
    for (h_img, h_lbl), (d_img, d_lbl) in zip(host, dev):
        assert isinstance(d_img, jax.Array)
        np.testing.assert_array_equal(np.asarray(d_img), h_img)
        np.testing.assert_array_equal(np.asarray(d_lbl), h_lbl)
        assert d_img.sharding.is_equivalent_to(sharding, d_img.ndim)


def test_global_batches_through_transform():
    """The fused preprocess transform runs on the assembled global array."""
    import jax.numpy as jnp

    from rtsds_tpu.ops.preprocess import make_transform

    ds = SyntheticSegDataset(8, (16, 24), 5, seed=0)
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    loader = MultiHostDataLoader(ds, 8, shuffle=False, seed=0, num_workers=2)
    transform = jax.jit(make_transform((16, 24), 5, antialias=False))
    batches = _collect(global_batches(loader, sharding, transform=transform))
    assert len(batches) == 1
    images, labels = batches[0]
    assert images.dtype == jnp.float32
    assert images.shape == (8, 16, 24, 3)
    assert labels.shape == (8, 16, 24)


def test_skip_batches_counts_global_groups_on_ragged_tail():
    """drop_last=False ragged tail: a host whose tail chunk is EMPTY must
    still count the tail group toward skip_batches, or hosts fast-forward
    to different stream positions (deterministic-resume guarantee)."""
    n, pc, gbs, seed, skip = 10, 4, 8, 5, 2
    ds = SyntheticSegDataset(n, (8, 12), 3, seed=2)
    local = gbs // pc

    def global_groups():  # mirror of the loader's enumeration
        epoch = 0
        while True:
            order = np.random.default_rng((seed, epoch)).permutation(n)
            epoch += 1
            for i in range(0, n, gbs):
                yield order[i:i + gbs]

    gi = global_groups()
    groups = [next(gi) for _ in range(8)]
    for p in range(pc):
        loader = MultiHostDataLoader(ds, gbs, shuffle=True, seed=seed,
                                     num_workers=1, process_index=p,
                                     process_count=pc, drop_last=False,
                                     infinite=True)
        loader.skip_batches(skip)
        got = next(loader._batch_indices())
        lo, hi = p * local, (p + 1) * local
        expected = next(g[lo:hi] for g in groups[skip:] if len(g[lo:hi]))
        np.testing.assert_array_equal(got, expected)
