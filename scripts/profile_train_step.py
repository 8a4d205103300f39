"""On-chip train-step profile: where do the milliseconds go?

Captures a jax.profiler trace of the exact bench train step (augmentation ->
ResNet fwd/bwd bf16 -> clip -> AdamW at batch 256, bench.py::bench_train_step)
plus fwd-only and fwd+bwd-only variants, then parses the xplane protobuf with
xprof and prints the top HLO ops by self time — the profile-backed attribution
VERDICT round 3 asked for (no round-3 artifact showed where the 50 ms step
goes; reference trains the same op mix through torch DDP with no public
per-op budget, perseus/detector/train.py:71-145).

Usage:
    python scripts/profile_train_step.py --output-dir outputs/profiles/r4 \
        [--batch-size 256] [--steps 12] [--variant full|fwd|fwdbwd]
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ProfileConfig:
    output_dir: str = "outputs/profiles/train_step"
    batch_size: int = 256
    steps: int = 12  # traced steps after warmup
    variant: str = "full"  # full | fwd | fwdbwd
    top_k: int = 40
    # storage dtype of the incoming batch — "bfloat16" measures the
    # device-resident-dataset path (TrainConfig.device_data_dtype)
    input_dtype: str = "float32"
    # A/B the space-to-depth stem reparametrization (TrainConfig.s2d_stem)
    s2d_stem: bool = False


def build_step(cfg: ProfileConfig):
    """The bench step (or a reduced variant), plus its example inputs.

    The batch tensors are returned as explicit arguments (NOT closed over):
    a closure constant is baked into the HLO program as a literal, and a
    batch-256 image tensor (~670 MB f32) overflows the axon tunnel's
    remote-compile request-body limit (observed as HTTP 413 on-chip).
    """
    from perseus_tpu.augment.pipeline import KeypointAugmentation
    from perseus_tpu.models import resnet
    from perseus_tpu.train import train as tm
    from perseus_tpu.train.config import TrainConfig

    b = cfg.batch_size
    tcfg = TrainConfig(batch_size=b, in_channels=4, amp=True, s2d_stem=cfg.s2d_stem)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (b, 256, 256, 5)).astype(np.float32))
    images = images.astype(jnp.dtype(cfg.input_dtype))
    coords = jnp.asarray(rng.uniform(0, 255, (b, 8, 2)).astype(np.float32))
    optimizer = tm.make_optimizer(tcfg)
    state = tm.init_state(tcfg, optimizer, tm.make_mesh(n_devices=1))

    if cfg.variant == "full":
        aug = KeypointAugmentation(tcfg.augmentation_config, train=True)
        step = tm.make_train_step(tcfg, optimizer, aug)

        def run(st, i, imgs, crds):
            st2, loss = step(st, imgs, crds, jax.random.key(i, impl="rbg"))
            return st2, loss

        return run, state, (images, coords)

    # fwd / fwdbwd skip augmentation: pre-sliced channels, fixed targets
    x = images[..., :4]
    target = coords.reshape(b, -1) / 128.0 - 1.0

    if cfg.variant == "fwd":

        def run(st, i, xb, tgt):
            logits, _ = resnet.keypoint_cnn_apply(
                st.params, st.batch_stats, xb + i * 0.0, train=True,
                compute_dtype=jnp.bfloat16, s2d_stem=cfg.s2d_stem,
            )
            return st, jnp.mean((logits - tgt) ** 2)

        return run, state, (x, target)

    if cfg.variant == "fwdbwd":

        def loss_fn(params, st, i, xb, tgt):
            logits, new_stats = resnet.keypoint_cnn_apply(
                params, st.batch_stats, xb + i * 0.0, train=True,
                compute_dtype=jnp.bfloat16, s2d_stem=cfg.s2d_stem,
            )
            return tm.smooth_l1_loss(logits, tgt), new_stats

        def run(st, i, xb, tgt):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params, st, i, xb, tgt
            )
            # consume grads without the optimizer
            return st, loss + sum(jnp.sum(g) * 0.0 for g in jax.tree.leaves(grads))

        return run, state, (x, target)

    raise ValueError(f"unknown variant {cfg.variant!r}")


def top_ops_from_trace(trace_dir: str, top_k: int) -> list[dict]:
    """Parses the captured xplane protobuf into (op, self_time_us) rows."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xplane = paths[-1]
    # hlo_stats needs a device plane (TPU/GPU); CPU-only traces populate
    # framework_op_stats instead — fall through until a tool has rows.
    for tool in ("hlo_stats", "framework_op_stats"):
        rows = _stats_rows(xplane, tool)
        if rows:
            rows.sort(key=lambda r: -r["self_us"])
            return rows[:top_k]
    return []


def _stats_rows(xplane: str, tool: str) -> list[dict]:
    """Op table via the xprof/tensorboard profile-plugin converter."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older wheel name
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane], tool, {})
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    table = json.loads(data) if isinstance(data, str) else data
    # gviz table: {cols: [{label}], rows: [{c: [{v}, ...]}]}; some tools
    # return a list of tables (device, host) — take the fullest one
    if isinstance(table, list):
        table = max(table, key=lambda t: len(t.get("rows", [])))
    cols = [c.get("label", c.get("id", "")) for c in table["cols"]]

    def col(*names):
        for n in names:
            for i, label in enumerate(cols):
                if n.lower() in str(label).lower():
                    return i
        return None

    i_name = col("hlo op name", "hlo_op_name", "operation name")
    i_cat = col("hlo op category", "operation type", "category")
    i_self = col("total self time (us)", "total self-time (us)", "self time", "self_time")
    i_occ = col("#occurrences", "occurrences")
    rows = []
    for r in table["rows"]:
        c = r["c"]

        def v(i, default=None):
            if i is None or c[i] is None:
                return default
            return c[i].get("v", default)

        rows.append(
            {
                "op": str(v(i_name, "?")),
                "category": str(v(i_cat, "?")),
                "self_us": float(v(i_self, 0.0) or 0.0),
                "n": int(v(i_occ, 0) or 0),
            }
        )
    return rows


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(ProfileConfig)
    run, state, batch = build_step(cfg)
    from perseus_tpu.utils.xla_opts import tpu_compiler_options

    step = jax.jit(run, donate_argnums=0, compiler_options=tpu_compiler_options())

    t0 = time.time()
    state, loss = step(state, jnp.int32(0), *batch)
    jax.block_until_ready(loss)
    print(f"[profile] compiled + warm step in {time.time() - t0:.1f}s "
          f"(loss {float(loss):.4f})", flush=True)

    os.makedirs(cfg.output_dir, exist_ok=True)
    jax.profiler.start_trace(cfg.output_dir)
    t0 = time.time()
    for i in range(1, cfg.steps + 1):
        state, loss = step(state, jnp.int32(i), *batch)
    jax.block_until_ready(loss)
    wall = time.time() - t0
    jax.profiler.stop_trace()
    per_step_ms = wall / cfg.steps * 1e3
    print(f"[profile] {cfg.steps} steps traced: {per_step_ms:.2f} ms/step "
          f"({cfg.batch_size / per_step_ms * 1e3:,.0f} img/s)", flush=True)

    try:
        all_rows = top_ops_from_trace(cfg.output_dir, 100000)
    except Exception as exc:  # keep the timing even if parsing breaks
        print(f"[profile] xplane parse failed: {exc}", flush=True)
        all_rows = []
    rows = all_rows[: cfg.top_k]
    total = sum(r["self_us"] for r in rows)
    # category rollup over EVERY op (the round-4 top-25 left ~45% of the
    # step unattributed in a long tail of small ops)
    cats: dict[str, float] = {}
    for r in all_rows:
        cats[r["category"]] = cats.get(r["category"], 0.0) + r["self_us"]
    cat_rows = sorted(cats.items(), key=lambda kv: -kv[1])
    grand_total = sum(cats.values())
    for r in rows:
        print(f"  {r['self_us'] / cfg.steps:10.1f} us/step  x{r['n']:<5d} "
              f"{r['category']:<22s} {r['op']}", flush=True)
    print(f"[profile] device total {grand_total / cfg.steps / 1e3:.2f} ms/step by category:",
          flush=True)
    for cat, us in cat_rows:
        print(f"  {us / cfg.steps:10.1f} us/step  {cat}", flush=True)
    summary = {
        "variant": cfg.variant,
        "batch_size": cfg.batch_size,
        "ms_per_step": round(per_step_ms, 3),
        "images_per_sec": round(cfg.batch_size / per_step_ms * 1e3, 1),
        "device_ms_per_step": round(grand_total / cfg.steps / 1e3, 3),
        "category_totals_us_per_step": {
            c: round(us / cfg.steps, 1) for c, us in cat_rows
        },
        "top_ops": rows,
        "top_ops_total_us": total,
    }
    with open(os.path.join(cfg.output_dir, f"summary_{cfg.variant}.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in ("variant", "ms_per_step", "images_per_sec")}),
          flush=True)


if __name__ == "__main__":
    main()
