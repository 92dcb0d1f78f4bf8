import jax, jax.numpy as jnp
from flax import linen as nn
from rtsds_tpu.bench.latency import latency_benchmark
from rtsds_tpu.models.layers import conv, batch_norm, max_pool_3x3_s2

key = jax.random.key(0)
B = 8

def run(label, module_fn, in_shape, dtype_in=jnp.bfloat16):
    try:
        m = module_fn()
        x = jax.random.normal(key, (B, *in_shape), dtype_in)
        v = jax.jit(lambda k, x: m.init(k, x))(key, x)
        fn = lambda v, x: m.apply(v, x)
        s = latency_benchmark(fn, (v, x), iterations=8, repeats=3, warmup=1,
                              images_per_call=B, chain_index=1)
        print(f"RESULT {label}: {s['p50_ms']/B:.3f} ms/img", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)

class C(nn.Module):
    feats: int; k: int; s: int; p: int
    @nn.compact
    def __call__(self, x):
        return conv(self.feats, self.k, self.s, self.p, use_bias=False,
                    dtype=jnp.bfloat16)(x)

run("stem7x7s2 3->64 @1024x2048  ", lambda: C(64,7,2,3), (1024,2048,3))
run("conv3x3s2 3->64 @1024x2048  ", lambda: C(64,3,2,1), (1024,2048,3))
run("conv3x3s2 64->128 @512x1024 ", lambda: C(128,3,2,1), (512,1024,64))
run("conv3x3s2 128->256 @256x512 ", lambda: C(256,3,2,1), (256,512,128))
run("conv3x3s1 64->64 @256x512   ", lambda: C(64,3,1,1), (256,512,64))
run("conv3x3s1 128->128 @128x256 ", lambda: C(128,3,1,1), (128,256,128))
