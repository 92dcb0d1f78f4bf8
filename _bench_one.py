import sys, jax, jax.numpy as jnp
from rtsds_tpu.bench.latency import latency_benchmark
from rtsds_tpu.models.bisenet import BiSeNet
label, batch, interp = sys.argv[1], int(sys.argv[2]), sys.argv[3] == "1"
key = jax.random.key(0)
model = BiSeNet(num_classes=19, context_path="resnet18", dtype=jnp.bfloat16,
                with_interpolation=interp)
x = jax.random.normal(key, (batch, 1024, 2048, 3), jnp.float32)
v = jax.jit(lambda k, x: model.init(k, x, train=False))(key, x)
fwd = lambda v, x: model.apply(v, x, train=False)
s = latency_benchmark(fwd, (v, x), iterations=8, repeats=3, warmup=1,
                      images_per_call=batch, chain_index=1)
print(f"RESULT {label}: {s['p50_ms']/batch:.2f} ms/img -> {s['fps']:.1f} FPS", flush=True)
