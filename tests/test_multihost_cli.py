"""``python main.py --multihost`` end to end over TWO real OS processes.

The machinery test (``test_multiprocess_distributed.py``) proves the mesh
+ multi-host loader + fused DA step; this one drives the PRODUCTION
surface itself: ``cli.main`` with ``--multihost``, coordinator discovery
via the ``RTSDS_*`` env vars (``parallel/mesh.py:initialize_multihost``),
config batch sizes interpreted as GLOBAL, per-process shard loading, and
both ranks reporting the identical validation mIoU (the SPMD program is
one computation).
"""

import os
import socket
import subprocess
import sys
import time

import pytest
import yaml

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
from rtsds_tpu import cli

cli.main(["--config", sys.argv[1], "--synthetic", "--model", "bisenet",
          "--multihost"])
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_cli_multihost_two_processes(tmp_path):
    cfg = {
        "data": {
            # GLOBAL batch 8 = the 2x4 virtual-device total (a multiple of
            # the chip count, as production multihost configs must be)
            "cityscapes": {"image_size": "32, 64", "batch_size": 8,
                           "num_workers": 2},
            "gta5_modified": {"image_size": "40, 72", "batch_size": 8,
                              "num_workers": 2},
        },
        "training": {"segmentation": {"epochs": 1, "do_validation": 1}},
        # null disables the default callbacks: both ranks sharing one
        # orbax dir is a separate concern; this test isolates the
        # --multihost data/mesh path (image plots DO run multihost-safe
        # via the addressable-shard fetch in eval/validate.py)
        "callbacks": {"model_checkpoint": None, "early_stopping": None},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    port = _free_port()
    logs = [tmp_path / f"rank{r}.log" for r in (0, 1)]
    handles = [open(log, "w") for log in logs]
    procs = []
    for rank in (0, 1):
        env = {**os.environ, "PYTHONPATH": os.getcwd(),
               "JAX_PLATFORMS": "cpu",
               "RTSDS_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
               "RTSDS_NUM_PROCESSES": "2",
               "RTSDS_PROCESS_ID": str(rank)}
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        # cwd = tmp_path so default-path artifacts (images/) land in the
        # test sandbox, not the repo
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(cfg_path)],
            stdout=handles[rank], stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(tmp_path)))

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
                for h in handles:
                    h.flush()
                pytest.fail(f"rank {rank} exited with {ret}:\n"
                            f"{logs[rank].read_text()[-3000:]}")
        if pending and time.monotonic() > deadline:
            for q in procs:
                if q.poll() is None:
                    q.kill()
                    q.wait()
            pytest.fail("multihost CLI workers timed out")
        if pending:
            time.sleep(0.5)
    for h in handles:
        h.flush()
        h.close()

    mious = []
    for rank, log in enumerate(logs):
        out = log.read_text()
        lines = [ln for ln in out.splitlines()
                 if "Validation mIoU for Epoch" in ln]
        assert lines, f"rank {rank} never validated:\n{out[-2000:]}"
        mious.append(lines[-1].split(":")[-1].strip())
    # one SPMD program: both ranks computed the identical global mIoU
    assert mious[0] == mious[1], mious
