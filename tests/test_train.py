"""Training tests on the virtual 8-device CPU mesh: the jitted train step
learns on a tiny synthetic dataset, sharded == single-device numerics, the
plateau scheduler matches torch semantics, and checkpoints round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation
from perseus_tpu.data.dataset import KeypointDatasetConfig
from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset
from perseus_tpu.train import train as train_mod
from perseus_tpu.train.config import TrainConfig
from perseus_tpu.train.train import PlateauScheduler, TrainState, smooth_l1_loss


def test_smooth_l1_matches_torch_formula():
    import torch

    pred = np.random.default_rng(0).normal(size=(4, 16)).astype(np.float32) * 3
    target = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
    ours = float(smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target)))
    torch_loss = torch.nn.SmoothL1Loss(beta=1.0)(
        torch.from_numpy(pred), torch.from_numpy(target)
    )
    np.testing.assert_allclose(ours, float(torch_loss), rtol=1e-6)


def test_plateau_scheduler_torch_semantics():
    sched = PlateauScheduler(1e-3, patience=2, factor=0.5, min_lr=1e-5)
    assert sched.step(1.0) == 1e-3  # new best
    assert sched.step(1.0) == 1e-3  # bad 1
    assert sched.step(1.0) == 1e-3  # bad 2
    assert sched.step(1.0) == 5e-4  # bad 3 > patience -> reduce
    assert sched.step(0.5) == 5e-4  # new best resets
    for _ in range(20):
        sched.step(0.5)
    assert sched.lr >= 1e-5  # floor


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_root")
    path = generate_synthetic_pruned_dataset(str(root), n_train=16, n_test=8, h=32, w=32)
    # light augmentations: keep the costly warp but skip the heavy RGB chain
    aug = AugmentationConfig(
        planckian_jitter=False, blur=False, random_plasma_shadow=False, color_jiggle=False
    )
    return TrainConfig(
        batch_size=8,
        learning_rate=1e-3,
        n_epochs=2,
        dataset_config=KeypointDatasetConfig(dataset_path=path),
        augmentation_config=aug,
        in_channels=4,
        amp=False,  # f32 on CPU
        save_epochs=1000,  # skip checkpoint IO in the loop test
        cache_dataset=True,
    )


def test_train_loop_end_to_end(tiny_cfg):
    assert len(jax.devices()) == 8  # the virtual mesh is active
    result = train_mod.train(tiny_cfg)
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_val_loss"])
    state = result["state"]
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_train_step_learns(tiny_cfg):
    """Loss on a fixed batch decreases over repeated steps."""
    cfg = tiny_cfg
    mesh = train_mod.make_mesh()
    optimizer = train_mod.make_optimizer(cfg)
    state = train_mod.init_state(cfg, optimizer, mesh)
    aug = KeypointAugmentation(cfg.augmentation_config, train=False)  # deterministic
    step = jax.jit(train_mod.make_train_step(cfg, optimizer, aug))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 4)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 31, (8, 8, 2)).astype(np.float32))
    key = jax.random.key(0)
    losses = []
    for _ in range(5):
        state, loss = step(state, images, coords, key)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_matches_single_device(tiny_cfg):
    """The same step on a 1-device and an 8-device mesh gives the same loss
    (global-batch BN + mean-gradient all-reduce are sharding-invariant)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = tiny_cfg
    optimizer = train_mod.make_optimizer(cfg)
    aug = KeypointAugmentation(cfg.augmentation_config, train=False)

    rng = np.random.default_rng(1)
    images = rng.uniform(0, 1, (8, 32, 32, 4)).astype(np.float32)
    coords = rng.uniform(0, 31, (8, 8, 2)).astype(np.float32)
    key = jax.random.key(1)

    losses = {}
    states = {}
    for n in (1, 8):
        mesh = train_mod.make_mesh(n_devices=n)
        state = train_mod.init_state(cfg, optimizer, mesh)
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))
        step = jax.jit(
            train_mod.make_train_step(cfg, optimizer, aug),
            in_shardings=(repl, shard, shard, None),
            out_shardings=(repl, repl),
        )
        img_s = jax.device_put(jnp.asarray(images), shard)
        crd_s = jax.device_put(jnp.asarray(coords), shard)
        new_state, loss = step(state, img_s, crd_s, key)
        losses[n] = float(loss)
        states[n] = new_state
    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-5)
    p1 = np.asarray(states[1].params["fc.weight"])
    p8 = np.asarray(states[8].params["fc.weight"])
    np.testing.assert_allclose(p1, p8, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, tiny_cfg):
    from perseus_tpu.train import checkpoint as ckpt

    cfg = tiny_cfg
    mesh = train_mod.make_mesh()
    optimizer = train_mod.make_optimizer(cfg)
    state = train_mod.init_state(cfg, optimizer, mesh)
    directory = str(tmp_path / "ckpt")
    ckpt.save_train_state(
        directory,
        {"params": state.params, "batch_stats": state.batch_stats, "epoch": 3, "lr": 1e-4},
    )
    restored = ckpt.restore_train_state(directory)
    assert restored["epoch"] == 3
    np.testing.assert_allclose(
        np.asarray(restored["params"]["conv1.weight"]), np.asarray(state.params["conv1.weight"])
    )
    params, stats = ckpt.load_model(directory)
    assert "bn1.running_mean" in stats


def test_pth_interop_roundtrip(tmp_path, tiny_cfg):
    """Export to a reference .pth and load it back through the converter."""
    from perseus_tpu.train import checkpoint as ckpt

    cfg = tiny_cfg
    mesh = train_mod.make_mesh()
    optimizer = train_mod.make_optimizer(cfg)
    state = train_mod.init_state(cfg, optimizer, mesh)
    path = str(tmp_path / "export.pth")
    ckpt.export_reference_pth(path, state.params, state.batch_stats)
    params, stats = ckpt.load_model(path)
    np.testing.assert_allclose(
        np.asarray(params["conv1.weight"]), np.asarray(state.params["conv1.weight"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(stats["bn1.running_var"]), np.asarray(state.batch_stats["bn1.running_var"]), atol=0
    )

def test_train_resume_continues(tiny_cfg, tmp_path):
    """Resume restores params + optimizer state + epoch + LR and continues
    from the saved epoch (the failure-recovery path SURVEY.md section 5
    notes the reference lacks)."""
    import dataclasses

    from perseus_tpu.train import checkpoint as ckpt

    cfg1 = dataclasses.replace(tiny_cfg, n_epochs=1, save_epochs=1)
    result1 = train_mod.train(cfg1)
    state1 = result1["state"]
    run_dir = None
    import os
    from perseus_tpu import ROOT

    run_dir = os.path.join(ROOT, "outputs", "models", result1["run_id"])
    assert os.path.exists(run_dir)

    cfg2 = dataclasses.replace(tiny_cfg, n_epochs=2, resume=run_dir)
    result2 = train_mod.train(cfg2)
    assert result2["run_id"] == result1["run_id"]  # same run continues
    assert np.isfinite(result2["final_train_loss"])
    # resumed params differ from the checkpoint (epoch 1 actually trained)
    diff = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(jax.tree.leaves(result2["state"].params), jax.tree.leaves(state1.params))
    )
    assert diff > 0

    # restoring with a template recovers the optax structure exactly
    mesh = train_mod.make_mesh()
    optimizer = train_mod.make_optimizer(cfg1)
    fresh = train_mod.init_state(cfg1, optimizer, mesh)
    template = {
        "params": fresh.params, "batch_stats": fresh.batch_stats,
        "opt_state": fresh.opt_state, "epoch": 0, "lr": 0.0,
        "sched_best": 0.0, "sched_num_bad": 0,
    }
    saved = ckpt.restore_train_state(run_dir, target=template)
    assert jax.tree.structure(saved["opt_state"]) == jax.tree.structure(fresh.opt_state)


def test_train_resume_bit_identical(tiny_cfg):
    """Training N epochs, checkpointing, and resuming for N more produces
    BITWISE-identical params to an uninterrupted 2N-epoch run: the
    checkpoint carries optimizer state, epoch, LR, and the plateau
    scheduler's best/num_bad memory, and the per-step augmentation keys are
    derived from the global step (fold_in), so the resumed stream lines up."""
    import dataclasses
    import os
    import shutil

    from perseus_tpu import ROOT

    # straight run: 2 epochs
    cfg_straight = dataclasses.replace(tiny_cfg, n_epochs=2, save_epochs=1000)
    straight = train_mod.train(cfg_straight)

    # interrupted run: 1 epoch + checkpoint, then resume to epoch 2
    cfg_a = dataclasses.replace(tiny_cfg, n_epochs=1, save_epochs=1)
    run_a = train_mod.train(cfg_a)
    run_dir = os.path.join(ROOT, "outputs", "models", run_a["run_id"])
    cfg_b = dataclasses.replace(tiny_cfg, n_epochs=2, resume=run_dir)
    resumed = train_mod.train(cfg_b)

    for key in straight["state"].params:
        a = np.asarray(straight["state"].params[key])
        b = np.asarray(resumed["state"].params[key])
        assert np.array_equal(a, b), f"params[{key}] diverged after resume"
    for key in straight["state"].batch_stats:
        a = np.asarray(straight["state"].batch_stats[key])
        b = np.asarray(resumed["state"].batch_stats[key])
        assert np.array_equal(a, b), f"batch_stats[{key}] diverged after resume"
    shutil.rmtree(run_dir, ignore_errors=True)


def test_profiler_trace_written_on_resume(tiny_cfg, tmp_path):
    """profile_dir produces a trace on a RESUMED run too (the arm condition
    counts steps in this run, not global steps)."""
    import dataclasses
    import os
    import shutil

    from perseus_tpu import ROOT

    cfg_a = dataclasses.replace(tiny_cfg, n_epochs=1, save_epochs=1)
    run_a = train_mod.train(cfg_a)
    run_dir = os.path.join(ROOT, "outputs", "models", run_a["run_id"])
    prof_dir = str(tmp_path / "prof")
    cfg_b = dataclasses.replace(
        tiny_cfg, n_epochs=2, resume=run_dir, profile_dir=prof_dir, profile_steps=1
    )
    train_mod.train(cfg_b)
    traces = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(prof_dir)
        for f in fs
        if f.endswith(".xplane.pb") or f.endswith(".trace.json.gz")
    ]
    assert traces, f"no profiler trace written under {prof_dir}"
    shutil.rmtree(run_dir, ignore_errors=True)


def test_device_data_subset_refresh(tiny_cfg):
    """device_data_rows + device_data_refresh_epochs hold a rotating subset
    in device memory: training runs end-to-end and the drawn subsets differ
    across refresh windows while staying deterministic per window."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg,
        data_on_device=True,
        n_epochs=4,
        device_data_rows=8,
        device_data_refresh_epochs=2,
        batch_size=8,
    )
    result = train_mod.train(cfg)
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_val_loss"])


def test_train_step_bf16_amp_differentiates(tiny_cfg):
    """The amp=True (bf16 compute) path must be differentiable end to end —
    regression for the reduce_window-max VJP breaking with a finite
    (non -inf) init value under bf16."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, amp=True)
    optimizer = train_mod.make_optimizer(cfg)
    mesh = train_mod.make_mesh()
    state = train_mod.init_state(cfg, optimizer, mesh)
    aug = KeypointAugmentation(cfg.augmentation_config, train=True, fused=False)
    step = jax.jit(train_mod.make_train_step(cfg, optimizer, aug))
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 4)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 31, (8, 8, 2)).astype(np.float32))
    state, loss = step(state, images, coords, jax.random.key(0))
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_example_weights_change_loss_as_expected(tiny_cfg):
    """use_example_weights applies normalized per-example weights: uniform
    weights reproduce the unweighted loss exactly; concentrating all weight
    on one example reproduces that example's solo loss."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, use_example_weights=True)
    optimizer = train_mod.make_optimizer(cfg)
    state = train_mod.init_state(cfg, optimizer, train_mod.make_mesh(n_devices=1))
    aug = KeypointAugmentation(cfg.augmentation_config, train=False)  # deterministic
    step_w = jax.jit(train_mod.make_train_step(cfg, optimizer, aug))
    step_plain = jax.jit(
        train_mod.make_train_step(
            dataclasses.replace(cfg, use_example_weights=False), optimizer, aug
        )
    )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 4)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 31, (8, 8, 2)).astype(np.float32))
    key = jax.random.key(0)

    _, loss_plain = step_plain(state, images, coords, key)
    _, loss_uniform = step_w(state, images, coords, key, jnp.full((8,), 3.0))
    np.testing.assert_allclose(float(loss_uniform), float(loss_plain), rtol=1e-6)

    # all weight on example 0 == solo loss of example 0 — note BN batch stats
    # still see the whole batch, so compute the expectation with the same
    # batch through the weighted step itself at a one-hot weight
    one_hot = jnp.zeros((8,)).at[0].set(1.0)
    _, loss_one = step_w(state, images, coords, key, one_hot)
    # reference value: per-example losses from the model at these params
    from perseus_tpu.models import resnet
    import optax as _optax

    imgs_aug, target = aug(key, images, coords)
    pred, _ = resnet.keypoint_cnn_apply(
        state.params, state.batch_stats, imgs_aug[..., :4], train=True,
        compute_dtype=jnp.float32,
    )
    per = jnp.mean(_optax.huber_loss(pred, target.reshape(8, -1), delta=1.0), axis=-1)
    np.testing.assert_allclose(float(loss_one), float(per[0]), rtol=1e-5)

    # an outlier weight is capped at example_weight_clip x the mean and the
    # rest renormalized — the round-3 fix for inverse-frequency weights whose
    # singleton bins (600x the mean) collapse training to centroid guessing
    w_out = jnp.asarray([1000.0, 1, 1, 1, 1, 1, 1, 1], jnp.float32)
    _, loss_cap = step_w(state, images, coords, key, w_out)
    wn = np.asarray(w_out) / np.mean(w_out)
    wn = np.minimum(wn, cfg.example_weight_clip)
    wn = wn / np.mean(wn)
    np.testing.assert_allclose(float(loss_cap), float(np.mean(np.asarray(per) * wn)), rtol=1e-5)


def test_data_on_device_train_loop(tiny_cfg):
    """The device-resident dataset path trains end-to-end: finite losses,
    val computed over exactly the real rows, loss decreases across epochs."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, data_on_device=True, n_epochs=2)
    result = train_mod.train(cfg)
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_val_loss"])
    for leaf in jax.tree.leaves(result["state"].params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_device_dataset_val_counts_each_row_once(tiny_cfg):
    """_device_dataset wrap-pads rows to even shards; the val index/mask plan
    must count every real row exactly once."""
    from perseus_tpu.data.dataset import PrunedKeypointDataset

    cfg = tiny_cfg
    mesh = train_mod.make_mesh()  # 8 virtual devices
    ds = PrunedKeypointDataset(cfg.dataset_config, train=False, cache=True)  # 8 rows? n_test=8
    d_imgs, d_crds, d_w, valid, n_local = train_mod._device_dataset(
        ds, cfg, mesh, use_transplant=False
    )
    n_dev = 8
    assert d_imgs.shape[0] == n_dev * n_local
    assert valid.sum() == len(ds)
    # emulate the val plan: sequential local indices, masked by validity
    local_bs = max(1, cfg.batch_size // n_dev)
    valid2d = valid.reshape(n_dev, n_local)
    counted = 0.0
    for s in range(-(-n_local // local_bs)):
        length = min(local_bs, n_local - s * local_bs)
        mask2 = np.zeros((n_dev, local_bs), np.float32)
        mask2[:, :length] = valid2d[:, s * local_bs : s * local_bs + length]
        counted += mask2.sum()
    assert counted == len(ds)


def test_epoch_scan_matches_per_step(tiny_cfg):
    """The whole-epoch lax.scan dispatch is the same algorithm as the
    per-step path: same data order, same in-graph PRNG folds. XLA fuses the
    scan body differently than the standalone step (observed ~1e-6 relative
    f32 reduction-order noise at step 0, amplified by Adam thereafter), so
    the invariant is per-step loss agreement to tight tolerance — any
    wrong index or key shifts losses by O(1e-2)."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P
    from perseus_tpu.data.dataset import PrunedKeypointDataset

    cfg = dataclasses.replace(tiny_cfg, data_on_device=True)
    mesh = train_mod.make_mesh()
    n_dev = 8
    local_bs = cfg.batch_size // n_dev
    ds = PrunedKeypointDataset(cfg.dataset_config, train=True, cache=True)
    use_tp = cfg.augmentation_config.random_transplantation_with_depth
    d_imgs, d_crds, _, _, n_local = train_mod._device_dataset(ds, cfg, mesh, use_tp)
    opt = train_mod.make_optimizer(cfg)
    ta = KeypointAugmentation(cfg.augmentation_config, train=True)
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    step = jax.jit(
        train_mod.make_device_data_train_step(cfg, opt, ta, mesh=mesh),
        in_shardings=(replicated, data_sharded, data_sharded, data_sharded, None),
        out_shardings=(replicated, replicated),
    )
    epoch_fn = jax.jit(
        train_mod.make_device_data_epoch_fn(cfg, opt, ta, mesh=mesh),
        in_shardings=(
            replicated, data_sharded, data_sharded,
            NamedSharding(mesh, P(None, "data")), None, None,
        ),
        out_shardings=(replicated, replicated),
    )
    perms = np.stack(
        [np.random.default_rng((0, 0, d)).permutation(n_local) for d in range(n_dev)]
    )
    steps = n_local // local_bs
    idx_ep = np.stack(
        [
            np.ascontiguousarray(perms[:, s * local_bs : (s + 1) * local_bs]).reshape(-1)
            for s in range(steps)
        ]
    ).astype(np.int32)
    run_key = jax.random.key(cfg.random_seed, impl=cfg.rng_impl)
    state = train_mod.init_state(cfg, opt, mesh)
    _, scan_losses = epoch_fn(
        state,
        d_imgs,
        d_crds,
        jax.device_put(idx_ep, NamedSharding(mesh, P(None, "data"))),
        run_key,
        np.int32(0),
    )
    st = train_mod.init_state(cfg, opt, mesh)
    step_losses = []
    for s in range(steps):
        key = jax.random.fold_in(run_key, s)
        st, loss = step(st, d_imgs, d_crds, jax.device_put(idx_ep[s], data_sharded), key)
        step_losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(scan_losses), np.asarray(step_losses), rtol=1e-3)


def test_data_on_device_bf16_storage(tiny_cfg):
    """bf16 device-dataset storage trains end-to-end with finite losses."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_cfg, data_on_device=True, device_data_dtype="bfloat16", n_epochs=1
    )
    result = train_mod.train(cfg)
    assert np.isfinite(result["final_train_loss"])
    assert np.isfinite(result["final_val_loss"])


@pytest.mark.quick
def test_init_backbone_head_copy(tiny_cfg, tmp_path):
    """init_backbone copies everything but fc.*; init_head=True extends the
    copy to the matching fc head (the full warm start used to continue a
    finished run on a grown corpus with a fresh LR schedule)."""
    import dataclasses

    from perseus_tpu.train import checkpoint as ckpt

    mesh = train_mod.make_mesh()
    opt = train_mod.make_optimizer(tiny_cfg)
    src = train_mod.init_state(tiny_cfg, opt, mesh)
    ckpt_dir = str(tmp_path / "warm_src")
    ckpt.save_train_state(
        ckpt_dir, {"params": src.params, "batch_stats": src.batch_stats}
    )

    fc_keys = [k for k in src.params if k.startswith("fc.")]
    assert fc_keys, "expected an fc head in the param dict"

    for init_head, fc_should_match in ((False, False), (True, True)):
        cfg2 = dataclasses.replace(
            tiny_cfg, random_seed=tiny_cfg.random_seed + 1,
            init_backbone=ckpt_dir, init_head=init_head,
        )
        state = train_mod.init_state(cfg2, opt, mesh)
        # backbone always transfers
        np.testing.assert_array_equal(
            np.asarray(state.params["conv1.weight"]),
            np.asarray(src.params["conv1.weight"]),
        )
        fc_match = all(
            np.array_equal(np.asarray(state.params[k]), np.asarray(src.params[k]))
            for k in fc_keys
        )
        assert fc_match == fc_should_match
