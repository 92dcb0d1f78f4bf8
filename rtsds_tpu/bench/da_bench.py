"""Adversarial-DA training throughput bench: fused G/D steps per second.

The BASELINE.md scale-out metric ("GTA5->Cityscapes adversarial DA training
step rate").  One step = the full reference iteration (``train.py:172-270``):
2 generator forwards (720x1280 source + 512x1024 target), 3 discriminator
forwards, both backward passes, both optimizer updates.

Timing uses the same chained-dependency pattern as the latency harness:
steps are chained through the evolving train states inside a scan, fenced
by a host fetch, so async dispatch cannot fake the rate.

Run: ``python -m rtsds_tpu.bench.da_bench`` (env: DA_BATCH, DA_STEPS,
DA_SELF_TRAINING=1 to bench the fused pseudo-label step instead;
DA_ENTROPY=<lambda> / DA_FDA=<beta> to fuse MinEnt / FDA restyling in;
DA_CLASSMIX=1 for the DACS mixed-batch step; DA_VARIANT=v2 for the
authors' alternate adversarial recipe -- not gated, see below;
DA_GENERATOR=deeplab for the AdaptSegNet-original generator, ours --
also a coverage record, not gated).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Derived A100 reference rate for the ">5x A100" gate -- see BASELINE.md
# "Derived A100 reference DA step rate" for the roofline derivation
# (1.907 TFLOPs + 88.6 GB per iteration; memory-bound eager torch ~83 ms).
A100_REFERENCE_STEPS_PER_SEC = 12.0
V5E8_CHIPS = 8
TARGET_MULTIPLE = 5.0


def da_step_benchmark(batch_size: int = 4, src_hw=(720, 1280),
                      tgt_hw=(512, 1024), steps: int = 5, repeats: int = 3,
                      dtype=jnp.bfloat16, self_training: bool = False,
                      lambda_ent: float = 0.0, fda_beta: float = 0.0,
                      classmix: bool = False, variant: str = "v1",
                      generator: str = "bisenet",
                      remat: bool = False) -> dict:
    """``self_training=True`` benches the fused pseudo-label step
    (``train/self_training.py``: +1 teacher forward at target resolution,
    +1 thresholded CE, +1 EMA tree update vs the plain v1 step).

    ``variant="v2"`` benches the authors' alternate adversarial recipe
    (reference ``train.py:322-500``: scalar real/fake labels, adaptive
    pooling, D trained on the UPDATED generator's outputs) -- a different
    fused program from v1.  The BASELINE ">5x A100" gate is defined on v1;
    v2 numbers are coverage records, not gated.  Ignored when
    ``self_training`` is set (the pseudo-label step builds on v1).
    """
    from rtsds_tpu.models.bisenet import BiSeNet
    from rtsds_tpu.models.discriminator import TinyDomainDiscriminator
    from rtsds_tpu.train.adversarial import make_adversarial_step
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state
    from rtsds_tpu.utils.schedules import poly_lr_schedule

    key = jax.random.key(0)
    kg, kd, kx = jax.random.split(key, 3)

    if generator == "deeplab":
        # ours: AdaptSegNet's original generator (the reference
        # restricts DA to bisenet, main.py:172 -- coverage record only).
        # NEEDS remat on one chip: without it even b4 at 720x1280 fails
        # to compile (remote-compile helper memory wall, PERF.md).
        # The frozen-BN optimizer mask matches what build_adversarial
        # gives the production deeplab generator, so the benched program
        # is the one the CLI runs.
        from rtsds_tpu.models.deeplabv2 import DeepLabV2, frozen_bn_mask

        gen = DeepLabV2(num_classes=19, dtype=dtype, remat=remat)
        gen_tx = make_optimizer("Adam", poly_lr_schedule(1e-4, 5000, 0.9),
                                frozen_mask=frozen_bn_mask)
    else:
        gen = BiSeNet(num_classes=19, context_path="resnet18", dtype=dtype,
                      remat=remat)
        gen_tx = make_optimizer("Adam", poly_lr_schedule(1e-4, 5000, 0.9))
    gen_state = create_train_state(gen, kg,
                                   jnp.zeros((batch_size, *src_hw, 3)), gen_tx)
    dis = TinyDomainDiscriminator(num_classes=19, dtype=dtype)
    dis_tx = make_optimizer("Adam", 1e-4, weight_decay=1e-4)
    dis_state = create_train_state(dis, kd,
                                   jnp.zeros((batch_size, *tgt_hw, 19)), dis_tx)

    src_images = jax.random.normal(kx, (batch_size, *src_hw, 3), jnp.float32)
    src_labels = jnp.zeros((batch_size, *src_hw), jnp.int32)
    tgt_images = jax.random.normal(kx, (batch_size, *tgt_hw, 3), jnp.float32)

    if self_training:
        from rtsds_tpu.train.ema import ema_init
        from rtsds_tpu.train.self_training import make_self_training_step

        st_step = make_self_training_step(lambda_=0.1, iterations=100,
                                          threshold=0.9, donate=False,
                                          lambda_ent=lambda_ent,
                                          fda_beta=fda_beta,
                                          classmix=classmix)
        ema = ema_init(gen_state.params)

        def step(gen_state, dis_state, ema, *batch):
            g, d, e, metrics = st_step(gen_state, dis_state, ema, *batch)
            return g, d, e, metrics
    else:
        adv_step = make_adversarial_step(lambda_=0.1, iterations=100,
                                         epochs=50, variant=variant,
                                         donate=False,
                                         lambda_ent=lambda_ent,
                                         fda_beta=fda_beta)
        ema = None

        def step(gen_state, dis_state, ema, *batch):
            g, d, metrics = adv_step(gen_state, dis_state, *batch)
            return g, d, ema, metrics

    def run_n(gen_state, dis_state, ema, n: int):
        for _ in range(n):
            gen_state, dis_state, ema, metrics = step(
                gen_state, dis_state, ema, src_images, src_labels,
                tgt_images)
        return gen_state, dis_state, ema, metrics

    # warmup / compile
    gen_state, dis_state, ema, metrics = run_n(gen_state, dis_state, ema, 1)
    float(metrics["loss_gen_source"])  # fence

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        gen_state, dis_state, ema, metrics = run_n(gen_state, dis_state,
                                                   ema, steps)
        float(metrics["loss_gen_source"])  # state chain + fetch = hard fence
        times.append((time.perf_counter() - t0) / steps)

    best = min(times)
    return {
        "steps_per_sec": 1.0 / best,
        "ms_per_step": best * 1000.0,
        "batch_size": batch_size,
        "src_hw": list(src_hw),
        "tgt_hw": list(tgt_hw),
        "dtype": str(getattr(dtype, "__name__", dtype)),
        "self_training": self_training,
        "variant": "v1+pl" if self_training else variant,
        "generator": generator,
        "remat": remat,
        "classmix": classmix,
        "lambda_ent": lambda_ent,
        "fda_beta": fda_beta,
    }


def main():
    batch = int(os.environ.get("DA_BATCH", "4"))
    steps = int(os.environ.get("DA_STEPS", "5"))
    self_training = os.environ.get("DA_SELF_TRAINING", "0") == "1"
    lambda_ent = float(os.environ.get("DA_ENTROPY", "0"))
    fda_beta = float(os.environ.get("DA_FDA", "0"))
    classmix = os.environ.get("DA_CLASSMIX", "0") == "1"
    variant = os.environ.get("DA_VARIANT", "v1")
    generator = os.environ.get("DA_GENERATOR", "bisenet")
    # deeplab generators default remat ON (cannot compile without it)
    remat = os.environ.get(
        "DA_REMAT", "1" if generator == "deeplab" else "0") == "1"
    # DA_CLASSMIX implies the self-training step (ClassMix needs the teacher's
    # pseudo-labels); label and gate the result accordingly, not as plain DA
    effective_self_training = self_training or classmix
    stats = da_step_benchmark(batch_size=batch, steps=steps,
                              self_training=effective_self_training,
                              lambda_ent=lambda_ent, fda_beta=fda_beta,
                              classmix=classmix, variant=variant,
                              generator=generator, remat=remat)
    sps = stats["steps_per_sec"]
    if effective_self_training:
        metric = "da_self_training_steps_per_sec"
    elif variant != "v1":
        metric = f"da_{variant}_train_steps_per_sec"
    else:
        metric = "da_train_steps_per_sec"
    # the BASELINE ">5x A100" gate is defined on the PLAIN v1 step; any
    # other configuration is a coverage record, marked so its (lower)
    # rate cannot be misread as a gate regression
    gated = (variant == "v1" and not effective_self_training
             and lambda_ent == 0 and fda_beta == 0
             and generator == "bisenet" and not remat)
    out = {
        "metric": metric,
        "value": round(sps, 3),
        "unit": "steps/sec",
        # single chip vs the derived single-A100 reference rate
        "vs_baseline_a100": round(sps / A100_REFERENCE_STEPS_PER_SEC, 3),
        # the BASELINE.json gate: v5e-8 aggregate vs 5x the A100 rate
        "vs_baseline_v5e8_target": round(
            sps * V5E8_CHIPS
            / (A100_REFERENCE_STEPS_PER_SEC * TARGET_MULTIPLE), 3),
        **{k: v for k, v in stats.items() if k != "steps_per_sec"},
    }
    if not gated:
        out["caveat"] = ("baseline target defined on the plain v1 step; "
                        "this configuration is a coverage record")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
