"""Checkpointing and early stopping, implemented for real.

The reference *declares* a rich checkpoint/early-stopping schema
(``config.yaml:128-139``) but implements none of it; its only persistence
is ``torch.save(state_dict)`` on best validation mIoU inside the DA loop
(``train.py:310-314``), with no optimizer state, step counter or resume.

Here: Orbax-backed checkpoints of the FULL train state (params, batch
stats, optimizer state, step), periodic + best-k retention, and resume.
The ``best_mIoU`` tracking is hoisted across epochs, fixing the reference's
per-epoch reset bug (``train.py:162``, SURVEY.md §7).
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

from rtsds_tpu.callbacks.base import Callback


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for (multi-)state pytrees.

    ``states`` is a dict name -> TrainState-like pytree, e.g.
    ``{"model": state}`` or ``{"generator": g, "discriminator": d}``.
    """

    def __init__(self, save_dir: str, max_to_keep: int = 3,
                 best_mode: str = "max"):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.best_mode = best_mode
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get("monitor", 0.0)),
            best_mode=best_mode,
        )
        self.manager = ocp.CheckpointManager(self.save_dir, options=options)

    def save(self, step: int, states: dict, monitor: float | None = None):
        args = self._ocp.args.Composite(**{
            name: self._ocp.args.StandardSave(_savable(state))
            for name, state in states.items()})
        metrics = {"monitor": float(monitor)} if monitor is not None else None
        step = int(step)
        # orbax never overwrites an existing step (a same-step save is
        # silently no-op'd, or raises under force) -- but a replayed epoch
        # after a mid-epoch emergency snapshot at the same step MUST
        # replace the stale snapshot: delete first
        try:
            if step in set(self.manager.all_steps()):
                self.manager.delete(step)
        except Exception:
            pass  # no prior step / backend without delete: plain save
        self.manager.save(step, args=args, metrics=metrics, force=True)
        self.manager.wait_until_finished()

    # items the restore may tolerate missing from an older checkpoint --
    # everything else (model/generator/discriminator) is load-bearing:
    # resuming with ANY of those at random init would silently corrupt
    # the run, so their absence skips the whole restore
    OPTIONAL_ITEMS = frozenset({"ema"})

    def restore(self, states: dict, step: int | None = None) -> dict:
        """Restore into templates shaped like ``states``; returns new states.

        Tolerant ONLY for :attr:`OPTIONAL_ITEMS` (e.g. ``ema``): a
        template that asks for an optional item a pre-EMA checkpoint
        lacks still restores the core items, keeping the fresh template
        for the optional one.  If any NON-optional template item is
        absent from the checkpoint (e.g. a supervised 'model' checkpoint
        under a DA run's directory) the original ``states`` dict itself
        is returned, which callers use as the skip signal -- a partially
        random model must never resume at an advanced epoch.
        """
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            return states
        try:
            available = set(self.manager.item_metadata(int(step)).keys())
        except Exception:
            # metadata unavailable (older orbax): assume only the
            # REQUIRED items exist.  Assuming optional ones too would
            # make the Composite restore ask for a possibly-nonexistent
            # item -> KeyError -> the whole restore silently skipped,
            # the exact failure the optional-item tolerance prevents.
            available = set(states) - self.OPTIONAL_ITEMS
        required = set(states) - self.OPTIONAL_ITEMS
        if not required <= available:
            print(f"checkpoint restore skipped: step {step} holds "
                  f"{sorted(available)}, wanted {sorted(states)}")
            return states
        names = [n for n in states if n in available]
        missing = sorted(set(states) - set(names))
        if missing:
            print(f"checkpoint restore: optional items {missing} absent "
                  f"at step {step}; restoring {names}, keeping fresh "
                  f"state for the rest")
        args = self._ocp.args.Composite(**{
            name: self._ocp.args.StandardRestore(_savable(states[name]))
            for name in names})
        try:
            restored = self.manager.restore(int(step), args=args)
        except KeyError as e:
            print(f"checkpoint restore skipped: {e}")
            return states
        return {name: (_load_into(states[name], restored[name])
                       if name in restored else states[name])
                for name in states}

    def latest_step(self):
        return self.manager.latest_step()

    def all_steps(self):
        try:
            return list(self.manager.all_steps())
        except Exception:
            return []

    def best_step(self):
        return self.manager.best_step()

    def close(self):
        self.manager.close()


def _savable(state) -> dict:
    """TrainState -> plain dict of arrays (drops static fields)."""
    if hasattr(state, "params"):
        out = {"step": state.step, "params": state.params,
               "opt_state": state.opt_state}
        if state.batch_stats is not None:
            out["batch_stats"] = state.batch_stats
        return out
    return state


def _load_into(template, restored: dict):
    if hasattr(template, "params"):
        return template.replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
            batch_stats=restored.get("batch_stats", template.batch_stats),
        )
    return restored


def _improved(value: float, best: float | None, mode: str) -> bool:
    if best is None or not np.isfinite(best):
        return True
    return value > best if mode == "max" else value < best


class ModelCheckpoint(Callback):
    """Save-best / save-freq checkpointing (implements
    ``config.yaml:128-134``).  The loop attaches a state provider via
    :meth:`attach` so the callback can snapshot the live train state."""

    def __init__(self, save_dir: str = "checkpoints", save_name: str = "model",
                 save_best: bool = True, monitor: str = "validation_mIoU",
                 mode: str = "max", save_freq: int = 1, max_to_keep: int = 3):
        self.save_dir = os.path.join(save_dir, save_name)
        self.save_best = save_best
        self.monitor = monitor
        self.mode = mode
        self.save_freq = max(int(save_freq), 1)
        self.best: float | None = None
        self.best_step: int | None = None
        self._get_states: Callable[[], dict] | None = None
        self._get_emergency: Callable[[], dict] | None = None
        self._manager: CheckpointManager | None = None
        self._max_to_keep = max_to_keep
        self._epoch = 0

    def attach(self, get_states: Callable[[], dict],
               get_emergency_states: Callable[[], dict] | None = None):
        """``get_states`` feeds the regular (post-epoch) saves;
        ``get_emergency_states`` feeds :meth:`save_emergency`.  The loops
        pass an EPOCH-START snapshot as the emergency provider: the live
        state's buffers are donated by the first train step of the epoch
        (saving them raises 'Array has been deleted'), and a mid-epoch
        snapshot would make the EMERGENCY-marker replay non-deterministic
        (the replayed epoch would re-train on partially-advanced
        weights/EMA)."""
        self._get_states = get_states
        self._get_emergency = get_emergency_states
        if self._manager is None:
            self._manager = CheckpointManager(self.save_dir,
                                              max_to_keep=self._max_to_keep,
                                              best_mode=self.mode)
        return self

    @property
    def manager(self) -> CheckpointManager | None:
        return self._manager

    @property
    def _emergency_marker(self) -> str:
        return os.path.join(self.save_dir, "EMERGENCY")

    def _clear_emergency(self):
        try:
            os.remove(self._emergency_marker)
        except OSError:
            pass

    def on_epoch_end(self, epoch, logs=None):
        self._epoch = epoch
        if self._manager is None or self._get_states is None:
            return
        if not self.save_best and (epoch + 1) % self.save_freq == 0:
            self._manager.save(epoch, self._get_states())
            self._clear_emergency()

    def on_validation_end(self, logs=None, data=None):
        if self._manager is None or self._get_states is None or not logs:
            return
        value = logs.get(self.monitor)
        if value is None:
            return
        value = float(value)
        if self.save_best:
            if _improved(value, self.best, self.mode):
                self.best = value
                self.best_step = self._epoch
                self._manager.save(self._epoch, self._get_states(),
                                   monitor=value)
                self._clear_emergency()
                print(f"Best Model Saved at Epoch {self._epoch}")
        else:
            self._manager.save(self._epoch, self._get_states(), monitor=value)
            self._clear_emergency()

    def resume(self, states: dict) -> tuple[dict, int]:
        """Full resume: restore the latest checkpoint into ``states`` and
        return ``(restored_states, start_epoch)``.

        ``start_epoch`` is the epoch after the last saved one (0 when no
        checkpoint exists or the stored items don't match) -- UNLESS the
        latest save is a mid-epoch emergency snapshot, in which case the
        interrupted epoch itself is returned so it replays from its start
        (never silently skipping its untrained remainder).  The
        best-metric watermark is re-armed from the stored best step so
        save-best cannot regress to a worse model after resume.
        """
        if self._manager is None:
            self._manager = CheckpointManager(self.save_dir,
                                              max_to_keep=self._max_to_keep,
                                              best_mode=self.mode)
        mgr = self._manager
        latest = mgr.latest_step()
        restored = mgr.restore(states)
        if latest is None or restored is states:  # nothing / mismatch: fresh
            return states, 0
        start_epoch = int(latest) + 1
        try:
            with open(self._emergency_marker) as f:
                if int(f.read().strip()) == int(latest):
                    start_epoch = int(latest)  # replay interrupted epoch
        except (OSError, ValueError):
            pass
        best = mgr.best_step()
        if best is not None:
            try:
                metrics = mgr.manager.metrics(int(best)) or {}
                if "monitor" in metrics:
                    self.best = float(metrics["monitor"])
                    self.best_step = int(best)
            except Exception:
                pass  # old checkpoint layouts without metrics: keep fresh
        self._epoch = start_epoch
        print(f"Resuming from epoch {start_epoch} "
              f"(best {self.monitor}={self.best})")
        return restored, start_epoch

    def save_emergency(self) -> bool:
        """Best-effort snapshot when training is about to die (the loops
        call this from their exception path -- SURVEY §5.3: the reference
        loses the run on any crash).  Returns True if a checkpoint was
        written; never raises."""
        if self._manager is None or self._get_states is None:
            return False
        try:
            if int(self._epoch) in set(self._manager.all_steps()):
                # A checkpoint for this step already exists.  Re-saving
                # would delete it first (save() must delete-then-save
                # because orbax never overwrites a step) -- losing the
                # only copy of this epoch if we are killed mid-rewrite,
                # and destroying its stored 'monitor' metric (degrading
                # best_step()/--validate_only).  Keep it untouched: if it
                # is the post-epoch save, resume restarts the next epoch
                # from it; if it is a PREVIOUS emergency snapshot (its
                # EMERGENCY marker still present), resume replays this
                # epoch from it -- either way no progress beyond the
                # epoch boundary is lost.
                marker = os.path.exists(self._emergency_marker)
                print(f"Emergency: epoch {self._epoch} already has a "
                      f"{'mid-epoch' if marker else 'post-epoch'} snapshot;"
                      f" keeping it ({self.save_dir})")
                return True
            provider = self._get_emergency or self._get_states
            self._manager.save(self._epoch, provider())
            # mark this snapshot as MID-epoch: resume() replays the
            # interrupted epoch from its start instead of skipping its
            # untrained remainder
            with open(self._emergency_marker, "w") as f:
                f.write(str(int(self._epoch)))
            print(f"Emergency checkpoint saved at epoch {self._epoch} "
                  f"({self.save_dir})")
            return True
        except Exception as e:  # the original error must propagate instead
            print(f"emergency checkpoint failed: {e}")
            return False

    def on_train_end(self, logs=None):
        if self._manager is not None:
            self._manager.close()
            self._manager = None


class EarlyStopping(Callback):
    """Stop when the monitored metric stops improving (implements
    ``config.yaml:136-139``).  The loop polls :attr:`should_stop`."""

    def __init__(self, monitor: str = "validation_mIoU", mode: str = "max",
                 patience: int = 5, min_delta: float = 0.0):
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.min_delta = min_delta
        self.best: float | None = None
        self.wait = 0
        self.should_stop = False

    def on_validation_end(self, logs=None, data=None):
        if not logs or self.monitor not in logs:
            return
        value = float(logs[self.monitor])
        delta = self.min_delta if self.mode == "max" else -self.min_delta
        if self.best is None or (
                value > self.best + delta if self.mode == "max"
                else value < self.best - delta):
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                self.should_stop = True
                print(f"EarlyStopping: no {self.monitor} improvement for "
                      f"{self.patience} validations; stopping.")
