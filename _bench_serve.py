import jax, jax.numpy as jnp
from rtsds_tpu.bench.latency import latency_benchmark
from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.ops.preprocess import normalize

key = jax.random.key(0)

def run(label, batch, uint8_in):
    try:
        model = BiSeNet(19, "resnet18", dtype=jnp.bfloat16)
        if uint8_in:
            x = jax.random.randint(key, (batch, 1024, 2048, 3), 0, 255, jnp.int32).astype(jnp.uint8)
            fwd = lambda v, x: jnp.argmax(model.apply(v, normalize(x.astype(jnp.float32)), train=False), axis=-1).astype(jnp.int32)
            xi = jnp.zeros((batch, 1024, 2048, 3), jnp.float32)
            v = jax.jit(lambda k, xi: model.init(k, xi, train=False))(key, xi)
            # chain through a float side-input: wrap so chain_index hits a float arg
            xf = x.astype(jnp.float32)
            fwd2 = lambda v, xf: jnp.argmax(model.apply(v, normalize(xf), train=False), axis=-1).astype(jnp.int32)
            s = latency_benchmark(fwd2, (v, xf), iterations=8, repeats=3, warmup=1,
                                  images_per_call=batch, chain_index=1)
        else:
            x = jax.random.normal(key, (batch, 1024, 2048, 3), jnp.float32)
            v = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)
            fwd = lambda v, x: jnp.argmax(model.apply(v, x, train=False), axis=-1).astype(jnp.int32)
            s = latency_benchmark(fwd, (v, x), iterations=8, repeats=3, warmup=1,
                                  images_per_call=batch, chain_index=1)
        print(f"RESULT {label}: {s['p50_ms']/batch:.3f} ms/img -> {s['fps']:.1f} FPS", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)

run("masks-b16     ", 16, False)
run("masks-b4      ", 4, False)
