"""Multi-chip RTSDS-TPU: composed meshes, sharded training, sharded serving.

Demonstrates the parallelism surface on 8 devices.  On a real v5e-8 the
mesh axes ride ICI; to try it anywhere (CPU, no TPU needed):

    PYTHONPATH=. JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip.py

Shown here:
  1. pure data parallelism (the reference's DataParallel, done right)
  2. a composed data x spatial x FSDP mesh -- batch AND image height
     sharded, params/optimizer state FSDP-sharded, in ONE jit program
  3. batch-sharded multi-chip serving
In the CLI the same thing is one config line: ``mesh: {data: 2,
spatial: 2, model: 2}``.
"""

import numpy as np

import jax
import jax.numpy as jnp


def main():
    devices = jax.devices()
    print(f"{len(devices)} devices: {devices[0].platform}")
    assert len(devices) >= 8, "run with xla_force_host_platform_device_count=8"

    from rtsds_tpu.models.bisenet import BiSeNet
    from rtsds_tpu.parallel import (
        input_sharding,
        make_mesh_from_config,
        place_state,
        shard_batch,
    )
    from rtsds_tpu.train.optim import make_optimizer
    from rtsds_tpu.train.state import create_train_state
    from rtsds_tpu.train.supervised import make_train_step

    h, w, b = 64, 128, 8
    model = BiSeNet(num_classes=19, context_path="resnet18")
    images = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, h, w, 3)).astype(np.float32))
    labels = jnp.asarray(np.random.default_rng(1).integers(
        0, 19, size=(b, h, w)), jnp.int32)
    step = make_train_step(ignore_index=19, donate=False)

    # -- 1. data parallelism: batch sharded, params replicated; XLA
    #       inserts the gradient psum and cross-replica BN reductions
    mesh = make_mesh_from_config({"data": -1}, batch_size=b)
    state = place_state(create_train_state(
        model, jax.random.key(0), jnp.zeros((b, h, w, 3)),
        make_optimizer("Adam", 1e-3)), mesh)
    state, metrics = step(state, *shard_batch((images, labels), mesh))
    print(f"1. DP over {mesh.devices.size} chips: "
          f"loss={float(metrics['train_loss']):.4f}")

    # -- 2. composed mesh: data x spatial x model (FSDP)
    mesh3 = make_mesh_from_config({"data": 2, "spatial": 2, "model": 2},
                                  batch_size=b)
    state3 = place_state(create_train_state(
        model, jax.random.key(0), jnp.zeros((b, h, w, 3)),
        make_optimizer("Adam", 1e-3)), mesh3)
    put = lambda a: jax.device_put(a, input_sharding(mesh3))  # noqa: E731
    state3, metrics3 = step(state3, put(images), put(labels))
    print(f"2. DPxSPxFSDP {dict(mesh3.shape)}: "
          f"loss={float(metrics3['train_loss']):.4f} "
          f"(same math, one program)")

    # -- 3. multi-chip serving: weights replicated, frames batch-sharded
    from rtsds_tpu.serve import Predictor

    serve_mesh = make_mesh_from_config({"data": -1}, batch_size=8)
    predictor = Predictor(image_size=(h, w), batch_size=8,
                          mesh=serve_mesh, sharding="batch")
    frames = np.random.default_rng(2).integers(
        0, 256, (8, h, w, 3), dtype=np.uint8)
    masks = predictor.predict(frames)
    print(f"3. serving over {serve_mesh.devices.size} chips: "
          f"masks {masks.shape}")


if __name__ == "__main__":
    main()
