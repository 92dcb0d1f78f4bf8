import time, jax, jax.numpy as jnp
from rtsds_tpu.models.bisenet import BiSeNet
from rtsds_tpu.train.optim import make_optimizer
from rtsds_tpu.train.state import create_train_state
from rtsds_tpu.train.supervised import make_train_step
from rtsds_tpu.bench.latency import latency_benchmark

key = jax.random.key(0)
B = 4

# (a) supervised G train step at 720x1280 (fwd+bwd+adam), chained through state
model = BiSeNet(19, "resnet18", dtype=jnp.bfloat16)
tx = make_optimizer("Adam", 1e-4)
state = create_train_state(model, key, jnp.zeros((B, 720, 1280, 3)), tx)
step = make_train_step(donate=False)
img = jax.random.normal(key, (B, 720, 1280, 3), jnp.float32)
lbl = jnp.zeros((B, 720, 1280), jnp.int32)
state, m = step(state, img, lbl); float(m["train_loss"])  # compile+run
times = []
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(4):
        state, m = step(state, img, lbl)
    float(m["train_loss"])  # state chain makes this honest
    times.append((time.perf_counter()-t0)/4)
print(f"RESULT train-step-720x1280-b4: {min(times)*1000:.1f} ms/step", flush=True)

# (b) eval forward at 720x1280 b4 for comparison
fwd = lambda v, x: model.apply(v, x, train=False)
s = latency_benchmark(fwd, (state.variables, img), iterations=8, repeats=3,
                      warmup=1, images_per_call=B, chain_index=1)
print(f"RESULT eval-fwd-720x1280-b4: {s['p50_ms']:.1f} ms/batch", flush=True)

# (c) train-mode forward only (3 heads, BN stats) -- no grad
fwd_t = lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])[0][0]
s = latency_benchmark(fwd_t, (state.variables, img), iterations=8, repeats=3,
                      warmup=1, images_per_call=B, chain_index=1)
print(f"RESULT train-fwd-720x1280-b4: {s['p50_ms']:.1f} ms/batch", flush=True)
