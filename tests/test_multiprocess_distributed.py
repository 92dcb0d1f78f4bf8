"""REAL multi-process distributed test (SURVEY §5.8): two OS processes,
``jax.distributed.initialize`` over a localhost coordinator, a global mesh
spanning both processes' CPU devices, per-process MultiHostDataLoader
shards assembled with ``jax.make_array_from_process_local_data``, and a
jitted global-mean reduction whose result must equal the single-process
answer -- proving initialize_multihost + the multi-host input pipeline end
to end, not just at the API-shape level.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
from rtsds_tpu.parallel.mesh import initialize_multihost

rank = int(sys.argv[1])
port = sys.argv[2]
initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import jax.numpy as jnp
from rtsds_tpu.data.multihost import MultiHostDataLoader, global_batches
from rtsds_tpu.data.synthetic import SyntheticSegDataset
from rtsds_tpu.parallel.mesh import batch_sharding, make_mesh

mesh = make_mesh()          # spans BOTH processes' devices
sharding = batch_sharding(mesh)
ds = SyntheticSegDataset(16, (16, 24), 5, seed=0)
loader = MultiHostDataLoader(ds, 8, shuffle=True, seed=7, num_workers=2)
assert loader.process_count == 2 and loader.batch_size == 4

total = jnp.zeros((), jnp.float64)
count = 0
fn = jax.jit(lambda im: jnp.mean(im.astype(jnp.float32)))
for images, labels in global_batches(loader, sharding):
    assert images.shape[0] == 8          # GLOBAL batch
    total = total + fn(images)           # computes across both processes
    count += 1
print(f"RESULT rank={rank} batches={count} mean={float(total)/count:.10f}",
      flush=True)

# ---- the full fused adversarial train step across both processes ----
from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
from rtsds_tpu.ops.preprocess import make_transform
from rtsds_tpu.parallel.mesh import replicated_sharding, shard_state
from rtsds_tpu.train.adversarial import make_adversarial_step
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state

src_hw, tgt_hw, batch = (40, 72), (32, 64), 8
key = jax.random.key(0)
gen_state = create_train_state(
    BiSeNet(num_classes=19, context_path="resnet18"), key,
    jnp.zeros((batch, *src_hw, 3)), make_optimizer("Adam", 1e-4))
dis_state = create_train_state(
    TinyDomainDiscriminator(19), key,
    jnp.zeros((batch, *tgt_hw, 19)),
    make_optimizer("Adam", 1e-4, weight_decay=1e-4))
gen_state = shard_state(gen_state, mesh)
dis_state = shard_state(dis_state, mesh)

src_loader = MultiHostDataLoader(
    SyntheticSegDataset(batch, src_hw, 19, seed=3), batch, shuffle=False,
    num_workers=2)
tgt_loader = MultiHostDataLoader(
    SyntheticSegDataset(batch, tgt_hw, 19, seed=4), batch, shuffle=False,
    num_workers=2)
src_tf = jax.jit(make_transform(src_hw, 19, antialias=False))
tgt_tf = jax.jit(make_transform(tgt_hw, 19, antialias=True))
src_images, src_labels = next(iter(
    global_batches(src_loader, sharding, transform=src_tf)))
tgt_images, _ = next(iter(
    global_batches(tgt_loader, sharding, transform=tgt_tf)))

da_step = make_adversarial_step(lambda_=0.1, iterations=4, epochs=2,
                                variant="v1", donate=False)
gen_state, dis_state, metrics = da_step(gen_state, dis_state, src_images,
                                        src_labels, tgt_images)
losses = {k: float(metrics[k]) for k in
          ("loss_gen_source", "loss_adversarial", "loss_disc_source",
           "loss_disc_target")}
print(f"DA rank={rank} " + " ".join(f"{k}={v:.10f}"
                                    for k, v in sorted(losses.items())),
      flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_input_pipeline(tmp_path):
    import time

    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {**os.environ, "PYTHONPATH": os.getcwd(),
           "JAX_PLATFORMS": "cpu"}
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    # file-backed output (not PIPE): no pipe-buffer deadlock, and logs
    # survive for post-mortem on failure
    logs = [tmp_path / f"rank{rank}.log" for rank in (0, 1)]
    handles = [open(log, "w") for log in logs]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(rank), str(port)],
        stdout=handles[rank], stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.getcwd()) for rank in (0, 1)]

    def read_logs():
        for h in handles:
            h.flush()
        return [log.read_text() for log in logs]

    # Poll with one SHARED deadline (not a fixed per-process wait): on a
    # loaded box the compile+barrier can take minutes, but if either rank
    # dies its peer would hang on the collective until the full timeout --
    # fail fast with the dead rank's log instead.
    deadline = time.monotonic() + 1200
    pending = {0: procs[0], 1: procs[1]}
    while pending:
        for rank in list(pending):
            ret = pending[rank].poll()
            if ret is None:
                continue
            del pending[rank]
            if ret != 0:
                for q in procs:
                    if q.poll() is None:
                        q.kill()
                        q.wait()
                pytest.fail(f"rank {rank} exited with {ret}:\n"
                            f"{read_logs()[rank][-3000:]}")
        if pending and time.monotonic() > deadline:
            for q in procs:
                if q.poll() is None:
                    q.kill()
                    q.wait()
            outs = read_logs()
            pytest.fail("distributed workers timed out; logs:\n"
                        + "\n----\n".join(o[-1500:] for o in outs))
        if pending:
            time.sleep(0.5)
    outs = read_logs()
    for h in handles:
        h.close()

    means = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        assert "batches=2" in line
        means.append(float(line.split("mean=")[1]))
    # both processes computed the same GLOBAL mean
    assert abs(means[0] - means[1]) < 1e-9

    # the fused DA step ran across both processes and produced identical
    # losses on each rank (the program is one SPMD computation)
    da_lines = [[ln for ln in out.splitlines() if ln.startswith("DA ")][0]
                for out in outs]
    vals = [dict(kv.split("=") for kv in ln.split()[2:]) for ln in da_lines]
    for k in vals[0]:
        assert vals[0][k] == vals[1][k], (k, vals)
        assert np.isfinite(float(vals[0][k]))

    # and it matches the single-process answer over the same global batches
    from rtsds_tpu.data.multihost import MultiHostDataLoader
    from rtsds_tpu.data.synthetic import SyntheticSegDataset

    ds = SyntheticSegDataset(16, (16, 24), 5, seed=0)
    loader = MultiHostDataLoader(ds, 8, shuffle=True, seed=7, num_workers=2,
                                 process_index=0, process_count=1)
    ref = np.mean([np.mean(img.astype(np.float32))
                   for img, _ in loader])
    np.testing.assert_allclose(means[0], ref, rtol=1e-6)
