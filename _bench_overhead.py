import time, jax, jax.numpy as jnp
from functools import partial
key = jax.random.key(0)

def chain_time(label, fn, x, iters):
    @partial(jax.jit, static_argnums=(1,))
    def run_k(x, k):
        def body(_, acc):
            out = fn(x + (acc * 1e-12).astype(x.dtype))
            return acc + out.reshape(-1)[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
    float(run_k(x, iters))  # compile
    t0 = time.perf_counter(); float(run_k(x, iters)); dt = time.perf_counter() - t0
    print(f"RESULT {label} iters={iters}: {dt/iters*1000:.3f} ms/iter", flush=True)

tiny = jnp.ones((8, 128), jnp.float32)
big  = jnp.ones((8, 1024, 2048, 3), jnp.float32)
med  = jnp.ones((8, 128, 256, 128), jnp.bfloat16)

chain_time("tiny-mul", lambda x: x * 1.0001, tiny, 8)
chain_time("tiny-mul", lambda x: x * 1.0001, tiny, 64)
chain_time("big-mul ", lambda x: x * 1.0001, big, 8)
chain_time("med-mul ", lambda x: x * 1.0001, med, 8)

w = jax.random.normal(key, (3,3,128,128), jnp.bfloat16)
conv = lambda x: jax.lax.conv_general_dilated(x, w, (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC"))
chain_time("conv128 ", conv, med, 8)
chain_time("conv128 ", conv, med, 32)
