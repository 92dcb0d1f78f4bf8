"""RTSDS-TPU quickstart: the full lifecycle in one script.

Runs on anything (CPU included) with no datasets: synthetic data, a tiny
input size, one epoch.  Shows the canonical path a reference user takes
after migrating (MIGRATION.md):

    train (CLI) -> checkpoint -> restore-and-validate -> live serving ->
    AOT artifact -> artifact serving

Run:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/quickstart.py
"""

import os
import tempfile

import numpy as np
import yaml


def main(workdir: str | None = None, image_size=(64, 128)):
    workdir = workdir or tempfile.mkdtemp(prefix="rtsds_quickstart_")
    h, w = image_size

    # 1. A minimal config (the full schema is reference-compatible;
    #    everything omitted takes the shipped defaults).
    config = {
        "data": {
            "cityscapes": {"image_size": f"{h}, {w}", "batch_size": 2,
                           "num_workers": 2},
            "gta5_modified": {"image_size": f"{h}, {w}", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {"segmentation": {"epochs": 1, "do_validation": 1}},
        "callbacks": {
            "model_checkpoint": {"save_dir": os.path.join(workdir, "ckpt"),
                                 "save_name": "model", "save_best": True,
                                 "monitor": "validation_mIoU",
                                 "mode": "max", "save_freq": 1},
            "history": {"path": os.path.join(workdir, "history.jsonl")},
        },
    }
    cfg_path = os.path.join(workdir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    # 2. Train one epoch on synthetic data through the real CLI.
    from rtsds_tpu import cli

    cli.main(["--config", cfg_path, "--synthetic", "--model", "bisenet"])

    # 3. Restore the best checkpoint and validate (no training).
    cli.main(["--config", cfg_path, "--synthetic", "--validate_only"])

    # 4. Live serving from the checkpoint.
    from rtsds_tpu.serve import Predictor

    predictor = Predictor.from_checkpoint(
        os.path.join(workdir, "ckpt", "model"), image_size=image_size,
        batch_size=2)
    frames = np.random.default_rng(0).integers(
        0, 256, (2, h, w, 3), dtype=np.uint8)
    masks = predictor.predict(frames)
    print(f"live serving: masks {masks.shape}, classes "
          f"{np.unique(masks)[:8]}...")

    # 5. Export a self-contained AOT artifact and serve from it --
    #    no model code or checkpoint needed on the serving host.
    from rtsds_tpu.serve_export import export_predictor, load_predictor

    artifact = os.path.join(workdir, "model.rtsds")
    export_predictor(predictor, artifact, platforms=("cpu",), batch=2)
    masks2 = load_predictor(artifact).predict(frames)
    print(f"artifact serving: identical={bool((masks == masks2).all())} "
          f"({os.path.getsize(artifact)} bytes)")

    # 6. The machine-readable run record.
    from rtsds_tpu.callbacks.history import read_history

    events = [e["event"] for e in read_history(config["callbacks"]
                                               ["history"]["path"])]
    print(f"history: {events}")
    print(f"workdir: {workdir}")
    return workdir


if __name__ == "__main__":
    main()
