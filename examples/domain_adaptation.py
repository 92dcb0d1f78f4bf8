"""Adversarial domain adaptation (GTA5 -> Cityscapes), end to end.

The framework's namesake workflow (reference ``train.py:130-319``): a
BiSeNet generator learns segmentation on labeled source data while a
domain discriminator pushes its target-domain predictions to look
source-like.  Each iteration -- two generator forwards, three
discriminator forwards, both backward passes, both optimizer updates,
the LR/lambda schedules -- is ONE fused XLA program
(``rtsds_tpu/train/adversarial.py``).

Runs anywhere on synthetic data:

    PYTHONPATH=. JAX_PLATFORMS=cpu python examples/domain_adaptation.py
"""

import os
import tempfile

import yaml


def main(workdir: str | None = None, variant: str = "v1"):
    workdir = workdir or tempfile.mkdtemp(prefix="rtsds_da_")
    config = {
        "data": {
            # target domain (real, unlabeled at train time)
            "cityscapes": {"image_size": "32, 64", "batch_size": 2,
                           "num_workers": 2},
            # source domain (synthetic, labeled)
            "gta5_modified": {"image_size": "40, 72", "batch_size": 2,
                              "num_workers": 2},
        },
        "training": {
            "domain_adaptation": {
                "epochs": 2, "iterations": 3, "do_validation": 1,
                "when_print": 2,      # the reference accepted-but-ignored knob
                "variant": variant,   # "v1" (paper) or "v2" (authors' alt)
            },
        },
        "callbacks": {
            "model_checkpoint": {"save_dir": os.path.join(workdir, "ckpt"),
                                 "save_name": "da", "save_best": True,
                                 "monitor": "validation_mIoU", "mode": "max",
                                 "save_freq": 1},
            "history": {"path": os.path.join(workdir, "history.jsonl")},
        },
    }
    cfg_path = os.path.join(workdir, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    from rtsds_tpu import cli

    # adversarial training: per-epoch 4-loss table + per-class validation
    cli.main(["--config", cfg_path, "--synthetic", "--domain_adaptation"])

    # the generator checkpoint is a normal segmentation model: validate it
    cli.main(["--config", cfg_path, "--synthetic", "--domain_adaptation",
              "--validate_only"])

    # ...and resume training for more epochs (epoch-aware: completed
    # epochs are never repeated, streams fast-forward deterministically)
    config["training"]["domain_adaptation"]["epochs"] = 3
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    cli.main(["--config", cfg_path, "--synthetic", "--domain_adaptation",
              "--resume"])

    from rtsds_tpu.callbacks.history import read_history

    events = [e["event"] for e in read_history(
        config["callbacks"]["history"]["path"])]
    print(f"history: {events}")
    print(f"workdir: {workdir}")
    return workdir


if __name__ == "__main__":
    main()
