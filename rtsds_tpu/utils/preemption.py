"""Graceful preemption: SIGTERM -> checkpoint -> clean exit.

Cloud TPU VMs (and most cluster schedulers) deliver SIGTERM shortly
before evicting a preemptible worker.  The reference dies instantly and
loses the run (SURVEY §5.3: no try/except anywhere); here the signal is
turned into a :class:`Preempted` exception raised inside the training
loop, whose existing crash path snapshots the full train state
(``ModelCheckpoint.save_emergency``) so ``--resume`` continues: completed
epochs are never repeated, and the interrupted epoch replays from its
start (the snapshot is marked mid-epoch so its untrained remainder is not
skipped).

The handler must be installed from the MAIN thread (CPython restriction);
the CLI does it before dispatching to a loop.
"""

from __future__ import annotations

import signal


class Preempted(Exception):
    """Raised in the main thread when a shutdown signal arrives."""


def install_preemption_handler(signals=(signal.SIGTERM,)):
    """Route the given signals into a :class:`Preempted` exception.

    Returns the previous handlers, ``{signum: handler}``, for restoring
    (mostly useful in tests).
    """
    previous = {}

    def _handler(signum, frame):
        raise Preempted(f"received signal {signum}")

    for sig in signals:
        try:
            previous[sig] = signal.signal(sig, _handler)
        except ValueError:
            pass  # not the main thread: run unprotected rather than crash
    return previous


def restore_handlers(previous: dict) -> None:
    for sig, handler in previous.items():
        signal.signal(sig, handler)
