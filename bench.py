"""Benchmark: detector inference throughput on the real chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: 256x256 RGBD frames/sec/chip through the folded-BN bf16
detector (BASELINE.md target: >= 10,000 f/s/chip -> vs_baseline = value/1e4).
Secondary numbers (printed to stderr): smoother p50 update latency and the
end-to-end streaming step.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DETECTOR_TARGET_FPS = 10_000.0


def _bench(fn, *args, warmup: int = 3, iters: int = 20) -> list[float]:
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return times


def bench_detector() -> float:
    from perseus_tpu.models import resnet

    params, stats = resnet.init_keypoint_cnn(jax.random.key(0), n_keypoints=8, num_channels=4)
    folded = resnet.fold_batchnorm(params, stats)
    batch = 256
    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, size=(batch, 256, 256, 4)).astype(np.float32)
    )

    @jax.jit
    def forward(x):
        return resnet.keypoint_cnn_apply_folded(folded, x, compute_dtype=jnp.bfloat16)

    times = _bench(forward, images, warmup=3, iters=30)
    median = float(np.median(times))
    fps = batch / median
    print(f"[bench] detector: batch={batch} median={median * 1e3:.2f} ms -> {fps:,.0f} f/s", file=sys.stderr)
    return fps


def bench_smoother() -> float:
    from perseus_tpu.camera import intrinsics_from_fov
    from perseus_tpu.datagen.labeling import cube_corners
    from perseus_tpu.smoother.fixed_lag import FixedLagSmoother
    from perseus_tpu.smoother.lm import SmootherConfig

    cfg = SmootherConfig(window=24, max_iterations=6)
    intr = intrinsics_from_fov(jnp.asarray(1.0), 256, 256)
    smoother = FixedLagSmoother(cfg, intr, cube_corners(0.035).astype(jnp.float32))
    carry = smoother.init()
    update = jax.jit(smoother.update)
    meas = jnp.asarray(
        np.random.default_rng(1).uniform(64, 192, size=(8, 2)).astype(np.float32)
    )

    # run a few updates to populate the window, then time steady state
    for _ in range(4):
        carry, _ = update(carry, meas)
        carry = jax.block_until_ready(carry)

    def step(c):
        new_c, pose = update(c, meas)
        return new_c

    times = _bench(step, carry, warmup=2, iters=25)
    p50_ms = float(np.median(times)) * 1e3
    print(f"[bench] smoother: window=24 p50={p50_ms:.3f} ms/update", file=sys.stderr)
    return p50_ms


def main() -> None:
    fps = bench_detector()
    try:
        p50 = bench_smoother()
    except Exception as exc:  # keep the headline metric robust
        print(f"[bench] smoother bench failed: {exc}", file=sys.stderr)
        p50 = float("nan")

    result = {
        "metric": "detector_inference_fps_per_chip_256x256_rgbd",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / DETECTOR_TARGET_FPS, 4),
        "smoother_p50_ms": round(p50, 3) if np.isfinite(p50) else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
