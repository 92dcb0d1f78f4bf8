"""Checkpoint inspection CLI: what's in a training checkpoint directory.

The reference persists opaque ``best_*.pth`` files (``train.py:310-314``)
a user can only inspect by loading into torch.  Our Orbax layout carries
more (multiple steps, per-step monitor metrics, item sets, emergency
markers) -- this tool surfaces it without restoring any weights:

    python -m rtsds_tpu.ckpt_info ckpt/model_da

prints one row per step (items, monitor metric, best/latest/emergency
flags).  Useful before ``--resume`` / ``--validate_only`` / serving to
see what a run left behind.  Metadata-only: safe on huge checkpoints.
"""

from __future__ import annotations

import argparse
import os


def describe_checkpoint(save_dir: str) -> dict:
    """Metadata summary of a ModelCheckpoint directory.

    Returns ``{"steps": [{"step", "items", "monitor"}...],
    "best_step", "latest_step", "emergency_step"}``; steps ascending.
    """
    from rtsds_tpu.callbacks.checkpoint import CheckpointManager

    # inspection must not create directories (CheckpointManager's ctor
    # makedirs its save_dir)
    if not os.path.isdir(save_dir):
        return {"steps": [], "best_step": None, "latest_step": None,
                "emergency_step": None}
    mgr = CheckpointManager(save_dir)
    try:
        steps = sorted(int(s) for s in mgr.all_steps())
        rows = []
        for step in steps:
            try:
                # 'metrics' is orbax's internal per-step metrics item,
                # not a saved state -- surfaced via 'monitor' below
                items = sorted(k for k in
                               mgr.manager.item_metadata(step).keys()
                               if k != "metrics")
            except Exception:
                items = []
            monitor = None
            try:
                metrics = mgr.manager.metrics(step) or {}
                if "monitor" in metrics:
                    monitor = float(metrics["monitor"])
            except Exception:
                pass
            rows.append({"step": step, "items": items, "monitor": monitor})
        best = mgr.best_step()
        latest = mgr.latest_step()
    finally:
        mgr.close()
    emergency = None
    try:
        with open(os.path.join(save_dir, "EMERGENCY")) as f:
            emergency = int(f.read().strip())
    except (OSError, ValueError):
        pass
    return {
        "steps": rows,
        "best_step": None if best is None else int(best),
        "latest_step": None if latest is None else int(latest),
        "emergency_step": emergency,
    }


def _subdirs_with_checkpoints(path: str) -> list[str]:
    try:
        children = sorted(os.scandir(path), key=lambda e: e.name)
    except OSError:
        return []
    return [c.path for c in children if c.is_dir()
            and describe_checkpoint(c.path)["steps"]]


def format_report(save_dir: str, info: dict) -> str:
    lines = [f"checkpoints in {save_dir}:"]
    for row in info["steps"]:
        flags = []
        if row["step"] == info["best_step"]:
            flags.append("best")
        if row["step"] == info["latest_step"]:
            flags.append("latest")
        if row["step"] == info["emergency_step"]:
            flags.append("EMERGENCY(mid-epoch)")
        monitor = ("-" if row["monitor"] is None
                   else f"{row['monitor']:.4f}")
        lines.append(f"  step {row['step']:>4}  monitor={monitor:>8}  "
                     f"items=[{', '.join(row['items'])}]"
                     + (f"  <- {', '.join(flags)}" if flags else ""))
    if not info["steps"]:
        lines.append("  (none)")
    return "\n".join(lines)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Inspect an RTSDS-TPU checkpoint directory "
                    "(steps, items, metrics; metadata only)")
    parser.add_argument("checkpoint", help="ModelCheckpoint directory "
                        "(e.g. checkpoints/model_da)")
    args = parser.parse_args(argv)

    info = describe_checkpoint(args.checkpoint)
    if not info["steps"]:
        # a run root was given instead of a specific save_name dir:
        # descend one level so `ckpt_info checkpoints` just works
        subs = _subdirs_with_checkpoints(args.checkpoint)
        if subs:
            for sub in subs:
                print(format_report(sub, describe_checkpoint(sub)))
            return 0
    print(format_report(args.checkpoint, info))
    return 0 if info["steps"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
