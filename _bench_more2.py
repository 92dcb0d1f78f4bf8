from rtsds_tpu.bench.latency import bisenet_inference_benchmark
for batch in (64, 48):
    try:
        s = bisenet_inference_benchmark(batch_size=batch, iterations=6, repeats=3, warmup=1)
        print(f"RESULT masks-b{batch}: {s['p50_ms']/batch:.3f} ms/img -> {s['fps']:.1f} FPS", flush=True)
    except Exception as e:
        print(f"RESULT masks-b{batch}: FAILED {type(e).__name__} {str(e)[:90]}", flush=True)
