import jax, jax.numpy as jnp
from rtsds_tpu.bench.latency import latency_benchmark
from rtsds_tpu.models.bisenet import BiSeNet, SpatialPath
from rtsds_tpu.models.resnet import ResNetBackbone
from rtsds_tpu.ops.resize import upsample_bilinear

key = jax.random.key(0)
B = 8

def run(label, make_fn_and_args):
    try:
        fn, args = make_fn_and_args()
        s = latency_benchmark(fn, args, iterations=8, repeats=3, warmup=1,
                              images_per_call=B, chain_index=len(args)-1)
        print(f"RESULT {label}: {s['p50_ms']/B:.3f} ms/img", flush=True)
    except Exception as e:
        print(f"RESULT {label}: FAILED {type(e).__name__} {str(e)[:100]}", flush=True)

x_full = jax.random.normal(key, (B, 1024, 2048, 3), jnp.float32)

def full():
    m = BiSeNet(19, "resnet18", dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: m.init(k, x, train=False))(key, x_full)
    return (lambda v, x: m.apply(v, x, train=False)), (v, x_full)

def no_head():
    m = BiSeNet(19, "resnet18", dtype=jnp.bfloat16, with_interpolation=False)
    v = jax.jit(lambda k, x: m.init(k, x, train=False))(key, x_full)
    return (lambda v, x: m.apply(v, x, train=False)), (v, x_full)

def spatial():
    m = SpatialPath(dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: m.init(k, x, train=False))(key, x_full)
    return (lambda v, x: m.apply(v, x, train=False)), (v, x_full)

def context():
    m = ResNetBackbone("resnet18", dtype=jnp.bfloat16)
    v = jax.jit(lambda k, x: m.init(k, x, train=False))(key, x_full)
    return (lambda v, x: m.apply(v, x, train=False)[0]), (v, x_full)

def head_upsample():
    y = jax.random.normal(key, (B, 128, 256, 19), jnp.bfloat16)
    return (lambda x: upsample_bilinear(x, 8).astype(jnp.float32)), (y,)

run("full        ", full)
run("no-head     ", no_head)
run("spatial-path", spatial)
run("context-path", context)
run("head-upsample", head_upsample)
