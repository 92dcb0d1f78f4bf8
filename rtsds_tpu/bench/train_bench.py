"""Model-generic supervised train-step bench.

The reference's bench harness is model-generic (``utils.py:109`` takes any
``model``); ours is too: ``supervised_step_benchmark("bisenet"|"deeplab")``
times the fused supervised train step (forward + CE losses + backward +
optimizer update in ONE jit program, ``train/supervised.py``).

Timing uses the state-chaining fence of ``da_bench``: consecutive steps
chain through the evolving TrainState and a final host scalar fetch fences
the whole sequence, so async dispatch (and the axon backend's unreliable
``block_until_ready``) cannot fake the rate.

Run: ``python -m rtsds_tpu.bench.train_bench`` (env: TRAIN_MODEL,
TRAIN_BATCH, TRAIN_SIZE "H,W", TRAIN_STEPS, TRAIN_BACKBONE
resnet18|resnet101 for the bisenet context path; TRAIN_DISTILL=
bisenet|deeplab benches the fused KD step with that frozen teacher —
random teacher weights, cost is shape- not value-dependent;
TRAIN_BN_EVAL=1 benches DeepLab with fully-frozen BN,
``model.deeplab.bn_eval``; TRAIN_QAT=1 benches the QAT fake-quant
fine-tune step, ``train/qat.py`` -- f32 by design).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def supervised_step_benchmark(model_name: str = "bisenet",
                              batch_size: int = 8,
                              image_size=(720, 1280),
                              num_classes: int = 19,
                              steps: int = 5, repeats: int = 3,
                              dtype=jnp.bfloat16,
                              backbone: str = "resnet18",
                              distill_teacher: str | None = None,
                              distill_quant: str | None = None,
                              grad_clip: float = 0.0,
                              bn_eval: bool = False,
                              qat: bool = False) -> dict:
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state
    from rtsds_tpu.train.supervised import make_train_step
    from rtsds_tpu.utils.schedules import poly_lr_schedule

    if bn_eval and model_name != "deeplab":
        raise ValueError("bn_eval is a deeplab knob (model.deeplab."
                         "bn_eval); it does not apply to "
                         f"{model_name!r}")
    if distill_quant not in (None, "int8"):
        # a typo'd TRAIN_DISTILL_QUANT must not silently bench the
        # full-precision teacher under an int8-suffixed metric name
        raise ValueError(f"distill_quant {distill_quant!r} is not "
                         "supported (int8)")

    def build(name):
        if name == "deeplab":
            from rtsds_tpu.models.deeplabv2 import DeepLabV2

            return DeepLabV2(num_classes=num_classes, dtype=dtype,
                             bn_eval=bn_eval)
        if name == "bisenet":
            from rtsds_tpu.models.bisenet import BiSeNet

            return BiSeNet(num_classes=num_classes, context_path=backbone,
                           dtype=dtype)
        raise ValueError(f"unknown model {name!r}")

    model = build(model_name)
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch_size, *image_size, 3), jnp.float32)
    labels = jnp.zeros((batch_size, *image_size), jnp.int32)
    tx = make_optimizer("Adam", poly_lr_schedule(1e-4, 5000, 0.9),
                        grad_clip=grad_clip)
    state = create_train_state(model, key, jnp.zeros_like(x), tx)

    if qat:
        # the QAT fine-tune step (train/qat.py): fake-quant STE forward
        # over the BN-folded tree, f32 compute by design (fine-tune
        # fidelity, not serving speed) -- this measures what a
        # `python -m rtsds_tpu.qat` step costs on-chip
        if distill_teacher or bn_eval:
            raise ValueError("qat composes with neither distill nor "
                             "bn_eval (BN is frozen-folded already)")
        from rtsds_tpu.train.qat import create_qat_state, prepare_qat

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        state = create_qat_state(prepare_qat(model_name, variables, [x]),
                                 tx)

    if distill_teacher:
        from rtsds_tpu.train.distill import make_distill_step

        teacher = build(distill_teacher)
        t_vars = dict(teacher.init(jax.random.key(1), jnp.zeros_like(x),
                                   train=False))
        if distill_quant == "int8":
            # cost is shape-dependent; random weights calibrated on the
            # bench input are representative
            from rtsds_tpu.train.distill import quantize_teacher

            t_apply, t_vars = quantize_teacher(distill_teacher, t_vars,
                                               [x])
        else:
            t_apply = teacher.apply
        kd_step = make_distill_step(t_apply,
                                    ignore_index=num_classes,
                                    donate=False)

        def step(state, x, labels):
            return kd_step(state, t_vars, x, labels)
    else:
        step = make_train_step(ignore_index=num_classes, donate=False)

    def run_n(state, n):
        for _ in range(n):
            state, metrics = step(state, x, labels)
        return state, metrics

    state, metrics = run_n(state, 1)  # compile
    float(metrics["train_loss"])      # fence

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, metrics = run_n(state, steps)
        float(metrics["train_loss"])  # state chain + fetch = hard fence
        times.append((time.perf_counter() - t0) / steps)

    best = min(times)
    return {
        "model": model_name,
        "backbone": backbone,
        **({"distill_teacher": distill_teacher} if distill_teacher else {}),
        **({"distill_quant": distill_quant}
           if distill_teacher and distill_quant else {}),
        "steps_per_sec": 1.0 / best,
        "ms_per_step": best * 1000.0,
        "ms_per_sample": best * 1000.0 / batch_size,
        "batch_size": batch_size,
        "image_size": list(image_size),
        "dtype": ("float32" if qat
                  else str(getattr(dtype, "__name__", dtype))),
        **({"bn_eval": True} if bn_eval else {}),
        **({"qat": True} if qat else {}),
    }


def main():
    model = os.environ.get("TRAIN_MODEL", "bisenet")
    batch = int(os.environ.get("TRAIN_BATCH", "8"))
    size = tuple(int(v) for v in
                 os.environ.get("TRAIN_SIZE", "720,1280").split(","))
    steps = int(os.environ.get("TRAIN_STEPS", "5"))
    backbone = os.environ.get("TRAIN_BACKBONE", "resnet18")
    distill = os.environ.get("TRAIN_DISTILL") or None
    distill_quant = os.environ.get("TRAIN_DISTILL_QUANT") or None
    grad_clip = float(os.environ.get("TRAIN_GRAD_CLIP", "0"))
    bn_eval = os.environ.get("TRAIN_BN_EVAL", "0") == "1"
    qat = os.environ.get("TRAIN_QAT", "0") == "1"
    stats = supervised_step_benchmark(model, batch_size=batch,
                                      image_size=size, steps=steps,
                                      backbone=backbone,
                                      distill_teacher=distill,
                                      distill_quant=distill_quant,
                                      grad_clip=grad_clip,
                                      bn_eval=bn_eval, qat=qat)
    suffix = f"_{distill_quant}" if distill and distill_quant else ""
    name = (f"{model}_distill_from_{distill}{suffix}_train_step" if distill
            else f"{model}_qat_train_step" if qat
            else f"{model}_supervised_train_step")
    print(json.dumps({"metric": name,
                      "value": round(stats["ms_per_step"], 2),
                      "unit": "ms/step", **stats}))


if __name__ == "__main__":
    main()
