"""Attribute the train step's augmentation slice op by op, on the real chip.

The round-4 full-step profile bills ~5.2 ms/step to the fused Pallas
augmentation kernel (`fused_ultra_apply`) and ~3.2 ms to random-field
generation (`sample_fused_params`) out of a ~50 ms step. This harness times
each slice in isolation (chained inside one jitted scan, one scalar out —
the measurement discipline from bench.py) so optimization effort lands on
the slice that actually costs:

    field_gen     sample_fused_params (plasma + noise fields + scalars)
    ultra         the full transplant+swap+warp+chain mega-kernel
    warp_only     the two-pass lane-gather affine warp kernel alone
    chain_only    the elementwise chain kernel alone (fused_apply)
    maxpool_vjp   fwd+bwd of the 3x3/s2 maxpool: cmp-VJP vs select-and-scatter

Usage:  python scripts/bench_aug_kernel.py [--batch 256] [--reps 3] [--k 8]
Writes one JSON line per slice to stdout and a summary file with --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _force(out) -> None:
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def time_chain(make_args, fn, k: int, reps: int = 3, warmups: int = 2) -> float:
    """min-of-reps seconds per inner step of fn, chained k times in a scan."""
    for i in range(warmups):
        _force(fn(*make_args(1000 + i)))
    times = []
    for i in range(reps):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--slices", type=str, default="field_gen,ultra,warp_only,chain_only,maxpool_vjp")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke test of the harness)")
    ap.add_argument("--platform", type=str, default=None,
                    help="Force a jax platform (e.g. cpu). Must be applied "
                         "before any jax op: the axon sitecustomize pre-"
                         "registers the TPU backend, so the JAX_PLATFORMS "
                         "env var alone does NOT work here.")
    args = ap.parse_args()
    interp = args.interpret
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from perseus_tpu.augment import fused
    from perseus_tpu.augment.pipeline import AugmentationConfig
    from perseus_tpu.augment.warp_pallas import warp_affine_pallas

    b, h, w, c = args.batch, 256, 256, 5
    cfg = AugmentationConfig()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (b, h, w, c)).astype(np.float32)
    k = args.k
    results: dict[str, float] = {}
    want = set(args.slices.split(","))

    # --- field generation (sample_fused_params) ---------------------------
    if "field_gen" in want:
        @jax.jit
        def gen_chain(key):
            def body(key, _):
                p = fused.sample_fused_params(key, cfg, b, h, w, c)
                s = (jnp.sum(p["scalars"].astype(jnp.float32))
                     + jnp.sum(p["fields"][:, 0, 0, :].astype(jnp.float32))
                     + jnp.sum(p["plasma"][:, 0, :].astype(jnp.float32)))
                key = jax.random.fold_in(key, (s * 0).astype(jnp.int32) + 1)
                return key, s
            _, out = jax.lax.scan(body, key, None, length=k)
            return jnp.sum(out)

        results["field_gen_ms"] = time_chain(
            lambda i: (jax.random.key(i, impl="rbg"),), gen_chain, k, args.reps) * 1e3

    # --- shared inputs for the kernels ------------------------------------
    params = jax.jit(
        lambda key: fused.sample_fused_params(key, cfg, b, h, w, c)
    )(jax.random.key(7, impl="rbg"))
    params = jax.tree.map(lambda x: x.block_until_ready(), params)
    images16 = jnp.asarray(base).astype(jnp.bfloat16)

    # --- the full ultra kernel (transplant + swap + warp + chain) ---------
    if "ultra" in want:
        donors = jnp.asarray(rng.integers(0, b, (b,)), jnp.int32)
        swap = jnp.asarray(rng.uniform(0, 1, (b,)) < 0.5, jnp.float32)
        affine = jnp.asarray(rng.uniform(-0.1, 0.1, (b, 6)).astype(np.float32))
        affine = affine.at[:, 0].add(1.0).at[:, 4].add(1.0)

        @jax.jit
        def ultra_chain(img, prm):
            def body(img, _):
                out = fused.fused_ultra_apply(
                    img, donors, swap, affine, prm, lb=0.0, ub=1.0,
                    interpret=interp)
                img = (img.astype(jnp.float32) + out.astype(jnp.float32) * 1e-9
                       ).astype(img.dtype)
                return img, jnp.sum(out[:, 0, 0, :].astype(jnp.float32))
            _, outs = jax.lax.scan(body, img, None, length=k)
            return jnp.sum(outs)

        try:
            results["ultra_ms"] = time_chain(
                lambda i: (images16 + jnp.bfloat16(i * 1e-6), params),
                ultra_chain, k, args.reps) * 1e3
        except Exception as exc:  # signature drift — report, keep going
            print(f"[aug-bench] ultra failed: {exc}", file=sys.stderr)

    # --- warp-only kernel --------------------------------------------------
    if "warp_only" in want:
        wparams = jnp.asarray(
            np.stack([
                np.full(b, 1.05, np.float32),       # i00
                np.full(b, 0.02, np.float32),       # i01
                np.full(b, -3.0, np.float32),       # t0
                np.full(b, 0.01, np.float32),       # p
                np.full(b, 0.98, np.float32),       # q
                np.full(b, 2.0, np.float32),        # r
            ], axis=1))

        @jax.jit
        def warp_chain(img):
            def body(img, _):
                out = warp_affine_pallas(img, wparams, interpret=interp)
                img = img + out * 1e-9
                return img, jnp.sum(out[:, 0, 0, :])
            _, outs = jax.lax.scan(body, img, None, length=k)
            return jnp.sum(outs)

        results["warp_only_ms"] = time_chain(
            lambda i: (jnp.asarray(base + np.float32(i * 1e-6)),),
            warp_chain, k, args.reps) * 1e3

    # --- chain-only kernel (no warp) ---------------------------------------
    if "chain_only" in want:
        @jax.jit
        def chain_chain(img, prm):
            def body(img, _):
                out = fused.fused_apply(img, prm, interpret=interp)
                img = (img.astype(jnp.float32) + out.astype(jnp.float32) * 1e-9
                       ).astype(img.dtype)
                return img, jnp.sum(out[:, 0, 0, :].astype(jnp.float32))
            _, outs = jax.lax.scan(body, img, None, length=k)
            return jnp.sum(outs)

        try:
            results["chain_only_ms"] = time_chain(
                lambda i: (images16 + jnp.bfloat16(i * 1e-6), params),
                chain_chain, k, args.reps) * 1e3
        except Exception as exc:
            print(f"[aug-bench] chain_only failed: {exc}", file=sys.stderr)

    # --- maxpool fwd+bwd: cmp VJP vs select-and-scatter --------------------
    if "maxpool_vjp" in want:
        from perseus_tpu.models import resnet

        x0 = jnp.asarray(
            rng.uniform(-1, 1, (b, 128, 128, 64)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def make(fn):
            grad = jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32)))

            @jax.jit
            def chain(x):
                def body(x, _):
                    g = grad(x)
                    return x + g * jnp.bfloat16(1e-9), jnp.sum(g[0, 0, 0].astype(jnp.float32))
                _, outs = jax.lax.scan(body, x, None, length=k)
                return jnp.sum(outs)
            return chain

        results["maxpool_cmp_ms"] = time_chain(
            lambda i: (x0 + jnp.bfloat16(i * 1e-6),),
            make(resnet._max_pool_3x3_s2_cmp), k, args.reps) * 1e3
        results["maxpool_sas_ms"] = time_chain(
            lambda i: (x0 + jnp.bfloat16(i * 1e-6),),
            make(resnet._reduce_window_max_3x3_s2), k, args.reps) * 1e3

    results["batch"] = b
    line = json.dumps(results)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
