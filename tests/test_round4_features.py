"""Round-4 accuracy levers: spatial head, targeted oversampling, epoch EMA.

Differential/behavioral tests on the virtual 8-device CPU mesh:
  * spatial head: shape dispatch on fc fan-in, train/eval/folded agreement;
  * make_sample_weights targets the measured failure regimes and the
    weighted epoch draw oversamples them;
  * EMA rides through train(), differs from raw params, and checkpoints.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perseus_tpu.data.dataset import (
    KeypointDatasetConfig,
    PrefetchingLoader,
    PrunedKeypointDataset,
)
from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset
from perseus_tpu.models import resnet
from perseus_tpu.train import train as train_mod
from perseus_tpu.train.config import TrainConfig


def test_spatial_head_shapes_and_folded_parity():
    key = jax.random.key(0)
    params, stats = resnet.init_keypoint_cnn(
        key, n_keypoints=8, num_channels=4, head="spatial", feat_hw=2
    )
    assert params["fc.weight"].shape == (2 * 2 * 512, 16)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 4)).astype(np.float32))
    out, _ = resnet.keypoint_cnn_apply(params, stats, x, train=False)
    assert out.shape == (2, 16)
    folded = resnet.fold_batchnorm(params, stats)
    out_folded = resnet.keypoint_cnn_apply_folded(folded, x, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_folded), rtol=1e-4, atol=1e-4)


def test_spatial_head_wrong_resolution_raises():
    params, stats = resnet.init_keypoint_cnn(
        jax.random.key(0), n_keypoints=8, num_channels=4, head="spatial", feat_hw=2
    )
    x = jnp.zeros((1, 128, 128, 4), jnp.float32)  # feat 4x4, head built for 2x2
    with pytest.raises(ValueError, match="fan-in"):
        resnet.keypoint_cnn_apply(params, stats, x, train=False)


def test_unknown_head_raises():
    with pytest.raises(ValueError, match="unknown head"):
        resnet.init_keypoint_cnn(jax.random.key(0), head="heatmap")


@pytest.fixture(scope="module")
def ds64(tmp_path_factory):
    root = tmp_path_factory.mktemp("round4_ds")
    path = generate_synthetic_pruned_dataset(str(root), n_train=16, n_test=8, h=64, w=64)
    return path


def _cfg(path, **kw):
    from perseus_tpu.augment.pipeline import AugmentationConfig

    aug = AugmentationConfig(
        planckian_jitter=False, blur=False, random_plasma_shadow=False, color_jiggle=False
    )
    base = dict(
        batch_size=8,
        n_epochs=2,
        dataset_config=KeypointDatasetConfig(dataset_path=path),
        augmentation_config=aug,
        in_channels=4,
        amp=False,
        save_epochs=1000,
        input_resolution=64,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_sample_weights_target_failure_regimes(ds64):
    cfg = _cfg(ds64, oversample_close=2.0, oversample_outframe=1.0, close_seg_threshold=0.2)
    ds = PrunedKeypointDataset(cfg.dataset_config, train=True)
    w = train_mod.make_sample_weights(ds, cfg)
    assert w is not None and w.shape == (len(ds),)
    seg = np.asarray(ds.split.segmentation_ratios)
    pc = np.asarray(ds.pixel_coordinates)
    any_out = (
        (pc[..., 0] < 0) | (pc[..., 0] > ds.W - 1) | (pc[..., 1] < 0) | (pc[..., 1] > ds.H - 1)
    ).any(axis=-1)
    expected = 1.0 + 2.0 * (seg > 0.2) + 1.0 * any_out
    np.testing.assert_allclose(w, expected)
    # uniform path
    assert train_mod.make_sample_weights(ds, _cfg(ds64)) is None


def test_weighted_epoch_indices_oversample(ds64):
    cfg = _cfg(ds64)
    ds = PrunedKeypointDataset(cfg.dataset_config, train=True)
    n = len(ds)
    w = np.ones(n)
    w[:2] = 50.0  # two hot rows
    loader = PrefetchingLoader(ds, batch_size=4, shuffle=True, seed=0, sample_weights=w)
    counts = np.zeros(n)
    for e in range(30):
        idx = loader.epoch_indices(e)
        assert idx.shape == (n,)  # same epoch length as the uniform path
        counts += np.bincount(idx, minlength=n)
    hot = counts[:2].mean()
    cold = counts[2:].mean()
    assert hot > 5 * cold, (hot, cold)
    # determinism: same (seed, epoch) -> same draw
    np.testing.assert_array_equal(loader.epoch_indices(3), loader.epoch_indices(3))


def test_train_loop_spatial_oversample_ema(ds64, tmp_path):
    cfg = _cfg(
        ds64,
        head="spatial",
        oversample_close=2.0,
        oversample_outframe=1.0,
        ema_decay=0.5,
        n_epochs=3,
        data_on_device=True,
    )
    result = train_mod.train(cfg)
    assert np.isfinite(result["final_train_loss"])
    state = result["state"]
    assert state.params["fc.weight"].shape == (2 * 2 * 512, 16)
    ema = result["ema"]
    assert ema is not None
    # EMA lags the raw params after 3 epochs of updates
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ema["params"], state.params
    )
    assert max(jax.tree.leaves(diff)) > 0.0
    for leaf in jax.tree.leaves(ema):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_device_local_rows_layout(ds64):
    """_device_local_rows (the weighted-draw row lookup) must match the
    actual _device_dataset upload layout: coords of shard d row i equal the
    dataset's coords at the predicted row — for whole splits, non-divisible
    wrap-padded splits, and row subsets."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = train_mod.make_mesh(n_devices=8)
    cfg = _cfg(ds64)
    ds = PrunedKeypointDataset(cfg.dataset_config, train=True)
    for subset in (None, np.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 3])):
        dd = train_mod._device_dataset(ds, cfg, mesh, use_transplant=False, subset=subset)
        d_imgs, d_crds, _, _, n_local = dd
        rows = train_mod._device_local_rows(8, n_local, len(ds), subset)
        got = np.asarray(d_crds).reshape(8, n_local, 8, 2)
        want = np.stack([ds.batch(rows[d])["pixel_coordinates"] for d in range(8)])
        np.testing.assert_allclose(got, want, atol=1e-5)
        for a in dd[:3]:
            a.delete()


def test_difficulty_sample_weights(ds64, tmp_path):
    """sample_weights_path multiplies into the epoch-sampling weights and is
    validated against the train split size."""
    ds = PrunedKeypointDataset(KeypointDatasetConfig(dataset_path=ds64), train=True)
    n = len(ds)
    dw = np.ones(n)
    dw[0] = 5.0
    p = str(tmp_path / "w.npy")
    np.save(p, dw)
    w = train_mod.make_sample_weights(ds, _cfg(ds64, sample_weights_path=p))
    assert w is not None and w[0] == 5.0 and w[1] == 1.0
    # composes multiplicatively with the regime terms
    w2 = train_mod.make_sample_weights(
        ds, _cfg(ds64, sample_weights_path=p, oversample_outframe=1.0)
    )
    assert w2[0] >= w[0]
    # wrong length -> hard error (stale weights from another split)
    np.save(p, np.ones(n + 3))
    with pytest.raises(ValueError, match="dataset rows"):
        train_mod.make_sample_weights(ds, _cfg(ds64, sample_weights_path=p))


def test_compute_difficulty_weights_script(ds64, tmp_path):
    """End-to-end: train 1 epoch, score difficulty with the checkpoint,
    weights load back into make_sample_weights."""
    import runpy
    import sys

    cfg = _cfg(ds64, n_epochs=1, save_epochs=1)
    result = train_mod.train(cfg)
    run_dir = f"{train_mod.ROOT}/outputs/models/{result['run_id']}"
    out = str(tmp_path / "dw.npy")
    argv = sys.argv
    sys.argv = [
        "dw", "--dataset-path", ds64, "--checkpoint", run_dir,
        "--output", out, "--batch-size", "8",
    ]
    try:
        runpy.run_path(
            f"{train_mod.ROOT}/scripts/compute_difficulty_weights.py", run_name="__main__"
        )
    finally:
        sys.argv = argv
    ds = PrunedKeypointDataset(KeypointDatasetConfig(dataset_path=ds64), train=True)
    w = np.load(out)
    assert w.shape == (len(ds),)
    assert (w >= 1.0).all() and (w <= 8.0).all() and w.max() > 1.0
    got = train_mod.make_sample_weights(ds, _cfg(ds64, sample_weights_path=out))
    np.testing.assert_allclose(got, w)


def test_outframe_loss_options_train(ds64):
    """outframe_corner_weight / outframe_clamp_px run end-to-end and train
    to a finite loss; weight=1 + clamp off is bit-identical to the default
    path (reference parity is the default)."""
    r_default = train_mod.train(_cfg(ds64, n_epochs=1))
    r_same = train_mod.train(
        _cfg(ds64, n_epochs=1, outframe_corner_weight=1.0, outframe_clamp_px=-1.0)
    )
    np.testing.assert_array_equal(
        np.asarray(r_default["state"].params["fc.bias"]),
        np.asarray(r_same["state"].params["fc.bias"]),
    )
    r_w = train_mod.train(
        _cfg(ds64, n_epochs=1, outframe_corner_weight=0.25, outframe_clamp_px=16.0)
    )
    assert np.isfinite(r_w["final_train_loss"])
    # spread (anti-hedging) aux loss trains and strictly raises the total
    # loss for an imperfect model
    r_s = train_mod.train(_cfg(ds64, n_epochs=1, spread_loss_weight=0.5))
    assert np.isfinite(r_s["final_train_loss"])
    assert r_s["train_loss_history"][0] > r_default["train_loss_history"][0]


def test_outframe_corner_weight_downweights_loss():
    """Unit check on the loss algebra: with one target far out of frame,
    weight 0 must reproduce the loss computed over in-frame coords only
    (up to the mean-normalization convention)."""
    import optax as _optax

    from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation

    cfg = TrainConfig(
        batch_size=2,
        dataset_config=KeypointDatasetConfig(dataset_path="unused"),
        augmentation_config=AugmentationConfig(
            random_transplantation_with_depth=False, random_affine=False,
            random_erasing=False, planckian_jitter=False, color_jiggle=False,
            blur=False, random_plasma_shadow=False, random_bias=False,
            depth_gaussian_noise=False, random_near_plane=False,
            random_far_plane=False,
        ),
        in_channels=4,
        amp=False,
        outframe_corner_weight=0.0,
    )
    import optax

    optimizer = optax.sgd(0.0)  # lr 0: step returns the loss untouched
    aug = KeypointAugmentation(cfg.augmentation_config, train=True)
    step = train_mod.make_train_step(cfg, optimizer, aug)
    params, stats = resnet.init_keypoint_cnn(jax.random.key(0), 8, 4)
    state = train_mod.TrainState(params, stats, optimizer.init(params))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 5)).astype(np.float32))
    crds = jnp.asarray(rng.uniform(5, 58, (2, 8, 2)).astype(np.float32))
    crds = crds.at[0, 0, 0].set(-500.0)  # one corner far off-screen
    _, loss = step(state, imgs, crds, jax.random.key(1))

    pred, _ = resnet.keypoint_cnn_apply(params, stats, imgs[..., :4], train=True)
    # the pipeline normalizes targets to [-1, 1] before the loss
    target = np.asarray(crds) * np.array([2 / 63.0, 2 / 63.0]) - 1.0
    per = _optax.huber_loss(pred, target.reshape(2, -1), delta=1.0)
    mask = np.ones((2, 16))
    mask[0, 0:2] = 0.0  # both coords of the off-screen corner
    w = mask / mask.mean()
    expect = float(np.mean(np.asarray(per) * w))
    assert abs(float(loss) - expect) < 1e-5, (float(loss), expect)


def test_sharded_augment_matches_per_shard_serial():
    """Pins what check_vma=False could silently break (train.py
    make_sharded_augment): the shard_mapped augmentation — full pipeline
    including the shard-local transplantation donor gather — equals running
    the augmentation per shard serially with the mesh position folded into
    the key. Covers per-shard donor locality AND independent RNG streams."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation

    mesh = train_mod.make_mesh(n_devices=8)
    aug = KeypointAugmentation(AugmentationConfig(), train=True)
    fn = train_mod.make_sharded_augment(aug, mesh)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (16, 32, 32, 5)).astype(np.float32))
    crds = jnp.asarray(rng.uniform(0, 31, (16, 8, 2)).astype(np.float32))
    key = jax.random.key(7)
    shard = NamedSharding(mesh, P("data"))
    out_i, out_c = fn(key, jax.device_put(imgs, shard), jax.device_put(crds, shard))

    per = 16 // 8
    parts = [
        aug(jax.random.fold_in(key, d), imgs[d * per : (d + 1) * per], crds[d * per : (d + 1) * per])
        for d in range(8)
    ]
    ref_i = jnp.concatenate([p[0] for p in parts])
    ref_c = jnp.concatenate([p[1] for p in parts])
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c), atol=1e-4)
    # independent streams: identical per-shard inputs still augment differently
    same = jnp.tile(imgs[:per], (8, 1, 1, 1))
    same_c = jnp.tile(crds[:per], (8, 1, 1))
    o_i, _ = fn(key, jax.device_put(same, shard), jax.device_put(same_c, shard))
    o_i = np.asarray(o_i)
    assert not np.allclose(o_i[:per], o_i[per : 2 * per])


def test_ema_checkpoint_roundtrip(ds64, tmp_path):
    from perseus_tpu import train as _  # noqa: F401
    from perseus_tpu.train import checkpoint as ckpt

    cfg = _cfg(ds64, ema_decay=0.5, n_epochs=2, save_epochs=1)
    result = train_mod.train(cfg)
    run_dir = f"{train_mod.ROOT}/outputs/models/{result['run_id']}"
    template = {
        "params": result["state"].params,
        "batch_stats": result["state"].batch_stats,
        "opt_state": result["state"].opt_state,
        "epoch": 0,
        "lr": 0.0,
        "sched_best": 0.0,
        "sched_num_bad": 0,
        "ema_params": result["ema"]["params"],
        "ema_batch_stats": result["ema"]["batch_stats"],
    }
    saved = ckpt.restore_train_state(run_dir, target=template)
    np.testing.assert_allclose(
        np.asarray(saved["ema_params"]["fc.bias"]),
        np.asarray(result["ema"]["params"]["fc.bias"]),
        rtol=1e-6,
    )
