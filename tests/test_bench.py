"""Benchmark harness smoke tests on CPU: structure, positivity, and the
XLA cost-analysis FLOPs path (utils.py:138-144 replacement)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.bench.flops import cost_analysis, count_parameters, model_flops
from rtsds_tpu.bench.latency import latency_benchmark


def test_latency_benchmark_structure():
    w = jnp.ones((256, 256))

    def fn(w, x):
        return jnp.tanh(x @ w)

    x = jnp.ones((64, 256))
    stats = latency_benchmark(fn, (w, x), iterations=4, repeats=2, warmup=1,
                              images_per_call=64, chain_index=1)
    for k in ("mean_ms", "p50_ms", "p95_ms", "p99_ms", "fps"):
        assert k in stats
    assert stats["fps"] > 0
    assert stats["p50_ms"] >= 0


def test_cost_analysis_matmul_flops():
    def fn(a, b):
        return a @ b

    a = jnp.ones((128, 64))
    b = jnp.ones((64, 32))
    costs = cost_analysis(fn, a, b)
    # 2*M*N*K = 2*128*32*64 = 524288; XLA reports >= this
    assert costs["flops"] >= 2 * 128 * 32 * 64 * 0.99


def test_count_parameters(key):
    from rtsds_tpu.models.discriminator import TinyDomainDiscriminator

    model = TinyDomainDiscriminator(num_classes=19)
    variables = model.init(key, jnp.zeros((1, 16, 16, 19)))
    n = count_parameters(variables["params"])
    # conv1: 4*4*19*64 + 64; classifier: 4*4*64*1 + 1
    assert n == (4 * 4 * 19 * 64 + 64) + (4 * 4 * 64 + 1)


def test_model_flops_smoke(key):
    from rtsds_tpu.models.discriminator import TinyDomainDiscriminator

    costs = model_flops(TinyDomainDiscriminator(num_classes=19),
                        (1, 32, 64, 19))
    assert costs["parameters"] > 0
    assert np.isfinite(costs["flops"]) and costs["flops"] > 0


@pytest.mark.slow
def test_supervised_step_benchmark_structure():
    """Model-generic train-step bench (utils.py:109 analog) runs on tiny
    CPU shapes and reports the expected fields for both models."""
    from rtsds_tpu.bench.train_bench import supervised_step_benchmark

    stats = supervised_step_benchmark("bisenet", batch_size=1,
                                      image_size=(32, 64), steps=1,
                                      repeats=1, dtype=None)
    assert stats["model"] == "bisenet"
    assert stats["ms_per_step"] >= 0
    assert stats["ms_per_sample"] == stats["ms_per_step"]

    import pytest

    with pytest.raises(ValueError, match="unknown model"):
        supervised_step_benchmark("nope")
    # a typo'd TRAIN_DISTILL_QUANT must raise, not silently bench the
    # full-precision teacher under an int8-suffixed metric name
    with pytest.raises(ValueError, match="distill_quant"):
        supervised_step_benchmark("bisenet", batch_size=1,
                                  image_size=(32, 64), steps=1, repeats=1,
                                  dtype=None, distill_teacher="bisenet",
                                  distill_quant="int4")
    # TRAIN_QAT composes with neither distill nor bn_eval
    with pytest.raises(ValueError, match="qat composes"):
        supervised_step_benchmark("bisenet", batch_size=1,
                                  image_size=(32, 64), steps=1, repeats=1,
                                  dtype=None, distill_teacher="bisenet",
                                  qat=True)


def test_sliding_bench_structure():
    """Panorama sliding bench (bf16 vs int8 through the whole blended
    predict) runs at tiny CPU shapes and reports the window count the
    25%-overlap default implies."""
    from rtsds_tpu.bench.sliding_bench import bench_sliding

    stats = bench_sliding(image_size=(64, 128), window=(32, 64), batch=1,
                          iterations=2, repeats=1, include_int8=False)
    assert stats["bench"] == "bisenet_sliding_serving"
    assert stats["windows_per_frame"] == 9
    assert stats["bf16_fps"] > 0
    with pytest.raises(ValueError, match="unknown model"):
        bench_sliding(model_name="nope")


def test_ensemble_bench_structure():
    from rtsds_tpu.bench.ensemble_bench import bench_ensemble

    stats = bench_ensemble(image_size=(64, 128), scales=(1.0,), batch=1,
                           iterations=2, repeats=1, include_int8=False)
    assert stats["bench"] == "bisenet_ensemble_serving"
    assert stats["bf16_fps"] > 0
    with pytest.raises(ValueError, match="unknown model"):
        bench_ensemble(model_name="nope")


@pytest.mark.slow
def test_da_step_benchmark_v2_variant():
    """bench.py's ``models`` section benches the v2 adversarial recipe
    (reference train.py:322-500) through the same harness; the variant
    knob must reach the step builder and be reported back."""
    from rtsds_tpu.bench.da_bench import da_step_benchmark

    stats = da_step_benchmark(batch_size=1, src_hw=(32, 64), tgt_hw=(32, 64),
                              steps=1, repeats=1, variant="v2")
    assert stats["variant"] == "v2"
    assert stats["steps_per_sec"] > 0
    assert stats["ms_per_step"] >= 0


def _load_bench_module():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_root", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_supervisor_retry_semantics(monkeypatch, capsys):
    """The driver-bench supervisor (bench.py:_supervise) runs the bench in
    a child process and retries exactly once on the observed transient
    failure modes: nonzero exit OR empty stdout.  The parent must never
    import jax (chip-claim isolation), so the logic is testable with a
    stubbed subprocess."""
    import subprocess
    import time
    import types

    bench = _load_bench_module()
    monkeypatch.setattr(time, "sleep", lambda s: None)

    def make_run(results):
        calls = []

        def fake_run(cmd, env=None, capture_output=None, text=None):
            assert env.get("RTSDS_BENCH_CHILD") == "1"
            calls.append(cmd)
            rc, out = results[min(len(calls), len(results)) - 1]
            return types.SimpleNamespace(returncode=rc, stdout=out,
                                         stderr="")

        return fake_run, calls

    # success first try: no retry, stdout passed through
    run, calls = make_run([(0, '{"metric": "x"}\n')])
    monkeypatch.setattr(subprocess, "run", run)
    assert bench._supervise() == 0
    assert len(calls) == 1
    assert capsys.readouterr().out == '{"metric": "x"}\n'

    # exit-0-but-empty-stdout (the documented axon hiccup): retried once
    run, calls = make_run([(0, ""), (0, '{"metric": "y"}\n')])
    monkeypatch.setattr(subprocess, "run", run)
    assert bench._supervise() == 0
    assert len(calls) == 2
    assert capsys.readouterr().out == '{"metric": "y"}\n'

    # two failures: gives up with the child's exit code, exactly 2 tries
    run, calls = make_run([(1, ""), (3, "partial")])
    monkeypatch.setattr(subprocess, "run", run)
    assert bench._supervise() == 3
    assert len(calls) == 2
