"""Checkpoint -> torch ``.pth`` exporter CLI.

Closes the ecosystem loop the import converter opened: weights trained
HERE load back into the reference's torch models with
``load_state_dict(strict=True)`` (the reference ingests state dicts at
``deeplabv2.py:179-188`` / ``build_contextpath.py:8``), so a reference
user can trial this framework without abandoning their torch deployment
or evaluation stack.

Usage::

    python -m rtsds_tpu.export_torch CHECKPOINT_DIR out.pth --model bisenet
    python -m rtsds_tpu.export_torch CHECKPOINT_DIR out.pth --model deeplab \
        --prefix Scale.

``--model bisenet`` emits the reference BiSeNet's exact key inventory
(misspelled ``saptial_path``, ``context_path.features.*`` aliases);
``--model deeplab`` emits the plain ResNetMulti inventory, with
``--prefix`` re-adding a dotted scope the reference strips on load
(MSCOCO-checkpoint style).  ``--model raw`` exports our scope names
verbatim (generic torch tooling).  Exported tensors are the checkpoint's
EMA weights when present (what validation scored); ``--no-ema`` opts out.
"""

from __future__ import annotations

import argparse

from rtsds_tpu.models.pretrained import (
    export_reference_bisenet_state_dict,
    export_torch_state_dict,
    save_state_dict,
)
from rtsds_tpu.serve import load_checkpoint_variables


def export_checkpoint(checkpoint_dir: str, out_path: str,
                      model: str = "bisenet", prefix: str = "",
                      use_ema: bool = True) -> int:
    """Export a training checkpoint as a torch state dict; entry count."""
    variables = load_checkpoint_variables(checkpoint_dir, use_ema=use_ema)
    if model == "bisenet":
        state = export_reference_bisenet_state_dict(variables)
        if prefix:
            state = {prefix + k: v for k, v in state.items()}
    else:  # deeplab and raw share the identity scope mapping
        state = export_torch_state_dict(variables, prefix=prefix)
    return save_state_dict(state, out_path)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export an RTSDS-TPU checkpoint as a torch .pth "
                    "state dict loadable by the reference models")
    parser.add_argument("checkpoint", help="ModelCheckpoint directory "
                        "(best/latest step, EMA item preferred)")
    parser.add_argument("out", help="output .pth path")
    parser.add_argument("--model", default="bisenet",
                        choices=["bisenet", "deeplab", "raw"],
                        help="target key layout: reference BiSeNet "
                             "(saptial_path + features aliases), reference "
                             "DeepLab/ResNetMulti, or our raw scope names")
    parser.add_argument("--prefix", default="",
                        help='dotted prefix to re-add (e.g. "Scale." for '
                             "MSCOCO-style DeepLab checkpoints)")
    parser.add_argument("--no-ema", action="store_true",
                        help="export raw training params even when the "
                             "checkpoint carries EMA weights")
    args = parser.parse_args(argv)

    n = export_checkpoint(args.checkpoint, args.out, model=args.model,
                          prefix=args.prefix, use_ema=not args.no_ema)
    print(f"exported {n} tensors -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
