"""EMA parameter averaging (train/ema.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rtsds_tpu.train.ema import ema_init, ema_update


def test_ema_matches_manual_trajectory():
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    ema = ema_init(params)
    manual = {k: np.asarray(v, np.float32) for k, v in params.items()}
    d = 0.9
    rng = np.random.default_rng(0)
    for _ in range(5):
        params = {k: jnp.asarray(rng.normal(size=v.shape), jnp.float32)
                  for k, v in params.items()}
        ema = ema_update(ema, params, decay=d)
        manual = {k: d * manual[k] + (1 - d) * np.asarray(params[k])
                  for k in manual}
    for k in manual:
        np.testing.assert_allclose(np.asarray(ema[k]), manual[k], rtol=1e-5,
                                   atol=1e-7)


def test_ema_warmup_tracks_params_early():
    params = {"w": jnp.full((4,), 10.0)}
    ema = ema_init({"w": jnp.zeros((4,))})
    # step 0: d = min(0.999, 1/10) = 0.1 -> EMA jumps 90% toward params
    ema = ema_update(ema, params, decay=0.999, step=0)
    np.testing.assert_allclose(np.asarray(ema["w"]), 9.0, rtol=1e-6)
    # large step: warmup saturates at the configured decay
    ema2 = ema_update({"w": jnp.zeros((4,))}, params, decay=0.999,
                      step=1_000_000)
    np.testing.assert_allclose(np.asarray(ema2["w"]), 0.01, rtol=1e-4)


def test_ema_init_copies_not_aliases():
    """The train steps donate their state; an aliased EMA tree would hold
    deleted buffers after the first update."""
    params = {"w": jnp.ones((4,))}
    ema = ema_init(params)
    assert (ema["w"].unsafe_buffer_pointer()
            != params["w"].unsafe_buffer_pointer())
    params["w"].delete()  # simulate donation consuming the original
    out = ema_update(ema, {"w": jnp.zeros((4,))}, decay=0.5)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.5)


def test_ema_inside_jit_and_dtype_preserving():
    params = {"w": jnp.ones((8,), jnp.bfloat16)}
    ema = ema_init(params)

    @jax.jit
    def step(ema, params):
        return ema_update(ema, params, decay=0.5)

    out = step(ema, {"w": jnp.zeros((8,), jnp.bfloat16)})
    assert out["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out["w"], np.float32), 0.5)
