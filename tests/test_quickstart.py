"""The examples/quickstart.py lifecycle script runs end to end."""

import os
import sys

import pytest


@pytest.mark.slow
def test_quickstart_lifecycle(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    try:
        import quickstart
    finally:
        sys.path.pop(0)

    workdir = quickstart.main(workdir=str(tmp_path), image_size=(32, 64))
    assert os.path.exists(os.path.join(workdir, "model.rtsds"))
    assert os.path.exists(os.path.join(workdir, "history.jsonl"))


@pytest.mark.slow
def test_domain_adaptation_example(tmp_path):
    """examples/domain_adaptation.py: DA train -> validate_only -> resume."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    try:
        import domain_adaptation
    finally:
        sys.path.pop(0)

    workdir = domain_adaptation.main(workdir=str(tmp_path))
    from rtsds_tpu.callbacks.history import read_history

    events = [e["event"] for e in read_history(
        os.path.join(workdir, "history.jsonl"))]
    # 2 epochs + 1 resumed epoch, each validated; two train_end records
    assert events.count("epoch") == 3
    assert events.count("validation") == 3
    assert events.count("train_end") == 2


@pytest.mark.slow
def test_multichip_example():
    """examples/multichip.py runs on the 8 virtual devices (conftest)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    try:
        import multichip
    finally:
        sys.path.pop(0)
    multichip.main()
