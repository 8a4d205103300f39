"""Training-recipe parity experiment: torch reference model vs JAX model.

BASELINE.md target 3 asks for RMSE parity against the reference's trained
checkpoints; those ship as LFS pointers only, so this experiment proves
parity constructively instead (the fallback SURVEY.md section 7 names):
train the reference's torch model (the exact architecture it builds,
reference: perseus/detector/models.py:6-40, recipe train.py:199-302) and
this package's JAX model

  * from the SAME initial weights (torch init converted to JAX),
  * on the SAME batches in the SAME order (one host loop drives both),
  * with the SAME recipe (AdamW lr/wd, SmoothL1 on [-1,1] coords,
    global-norm clip 1.0),

then compare validate-RMSE in pixels and round-trip the trained JAX weights
back into the torch model to show equal logits. Matched losses/RMSE here
mean the training semantics (model, loss, optimizer, BN) are equivalent —
which is exactly what "loading a reference checkpoint reproduces reference
behavior" requires.

Run: python -m perseus_tpu.eval.parity --dataset-path <pruned.hdf5>
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from perseus_tpu.data.dataset import KeypointDatasetConfig, PrunedKeypointDataset
from perseus_tpu.models import convert, resnet

__all__ = ["ParityConfig", "run_parity"]


@dataclass(frozen=True)
class ParityConfig:
    dataset_path: str = "data/pruned_dataset/pruned.hdf5"
    in_channels: int = 4
    n_keypoints: int = 8
    batch_size: int = 32
    epochs: int = 15
    learning_rate: float = 1e-3
    weight_decay: float = 1e-2
    grad_clip_norm: float = 1.0
    seed: int = 0
    output_json: str = ""  # optional path for the result artifact
    # Train both models on the SAME augmented tensors: each batch runs once
    # through the JAX train-mode augmentation pipeline (affine warp with
    # keypoint transform, erasing, color/depth ops, transplantation) and the
    # identical augmented images/targets feed both optimizers — parity of
    # the full recipe WITH augmentation in the loop, not just op-level
    # golden tests (reference: augmentations.py:441-488 + train.py:283).
    # (Kornia is not installable in this environment, so the torch model
    # cannot run its own aug stack; identical-tensor training is the
    # strongest available recipe-level claim.)
    augmented: bool = False


def _assemble(batch: dict, in_channels: int) -> np.ndarray:
    parts = [batch["image"]]
    if in_channels >= 4:
        parts.append(batch["depth_image"][..., None])
    return np.concatenate(parts, axis=-1, dtype=np.float32)


def _normalize_coords(coords: np.ndarray, h: int, w: int) -> np.ndarray:
    out = coords.astype(np.float32).copy()
    out[..., 0] = out[..., 0] / (w - 1) * 2 - 1
    out[..., 1] = out[..., 1] / (h - 1) * 2 - 1
    return out.reshape(coords.shape[0], -1)


def run_parity(cfg: ParityConfig) -> dict:
    import torch

    from perseus_tpu.eval.torch_oracle import TorchKeypointCNN

    torch.manual_seed(cfg.seed)
    torch.set_num_threads(os.cpu_count() or 1)

    train_ds = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=cfg.dataset_path), train=True, cache=True
    )
    val_ds = PrunedKeypointDataset(
        KeypointDatasetConfig(dataset_path=cfg.dataset_path), train=False, cache=True
    )
    h, w = train_ds.H, train_ds.W

    def split_arrays(ds):
        batch = ds.batch(np.arange(len(ds)))
        return _assemble(batch, cfg.in_channels), np.asarray(
            batch["pixel_coordinates"], np.float32
        )

    x_train, c_train = split_arrays(train_ds)
    x_val, c_val = split_arrays(val_ds)
    y_train = _normalize_coords(c_train, h, w)
    y_val = _normalize_coords(c_val, h, w)

    aug_jit = None
    if cfg.augmented:
        from perseus_tpu.augment.pipeline import AugmentationConfig, KeypointAugmentation

        aug_pipeline = KeypointAugmentation(AugmentationConfig(), train=True, fused=False)
        aug_jit = jax.jit(lambda k, x, c: aug_pipeline(k, x, c))
        batch_all = train_ds.batch(np.arange(len(train_ds)))
        x_train5 = np.concatenate(
            [
                batch_all["image"],
                batch_all["depth_image"][..., None],
                batch_all["segmentation_image"][..., None],
            ],
            axis=-1,
            dtype=np.float32,
        )

    # ---- identical initialization --------------------------------------
    torch_model = TorchKeypointCNN(n_keypoints=cfg.n_keypoints, num_channels=cfg.in_channels)
    sd0 = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert.from_torch_state_dict(sd0)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)

    # ---- matched optimizers --------------------------------------------
    torch_opt = torch.optim.AdamW(
        torch_model.parameters(), lr=cfg.learning_rate, weight_decay=cfg.weight_decay
    )
    torch_loss_fn = torch.nn.SmoothL1Loss(beta=1.0)

    optimizer = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay),
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def jax_step(params, stats, opt_state, xb, yb):
        def loss_fn(p):
            pred, new_stats = resnet.keypoint_cnn_apply(
                p, stats, xb, train=True, compute_dtype=jnp.float32
            )
            return jnp.mean(optax.huber_loss(pred, yb, delta=1.0)), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    # ---- one loop drives both trainings on the same batches ------------
    rng = np.random.default_rng(cfg.seed)
    n = len(x_train)
    history = []
    for epoch in range(cfg.epochs):
        order = rng.permutation(n)
        for s in range(n // cfg.batch_size):
            idx = order[s * cfg.batch_size : (s + 1) * cfg.batch_size]
            if aug_jit is not None:
                # one augmentation draw feeds BOTH models identically
                key = jax.random.fold_in(jax.random.key(cfg.seed), epoch * 100_000 + s)
                imgs5, crd = aug_jit(
                    key, jnp.asarray(x_train5[idx]), jnp.asarray(c_train[idx])
                )
                # f32 explicitly: under jax_enable_x64 (the test oracles'
                # config) default-dtype aug ops widen to f64, which the
                # torch model rejects
                xb = np.asarray(imgs5, dtype=np.float32)[..., : cfg.in_channels]
                yb = np.asarray(crd, dtype=np.float32).reshape(len(idx), -1)
            else:
                xb, yb = x_train[idx], y_train[idx]

            xb_t = torch.from_numpy(np.transpose(xb, (0, 3, 1, 2)))
            torch_opt.zero_grad()
            t_loss = torch_loss_fn(torch_model(xb_t), torch.from_numpy(yb))
            t_loss.backward()
            torch.nn.utils.clip_grad_norm_(torch_model.parameters(), cfg.grad_clip_norm)
            torch_opt.step()

            params, stats, opt_state, j_loss = jax_step(
                params, stats, opt_state, jnp.asarray(xb), jnp.asarray(yb)
            )
        t_last = float(t_loss.detach())
        history.append((t_last, float(j_loss)))
        print(f"[parity epoch {epoch}] torch {t_last:.5f}  jax {float(j_loss):.5f}")

    # ---- validate RMSE in pixels ---------------------------------------
    def px_rmse_torch():
        torch_model.eval()
        with torch.no_grad():
            pred = torch_model(torch.from_numpy(np.transpose(x_val, (0, 3, 1, 2)))).numpy()
        return _px_rmse(pred, y_val, h, w)

    def px_rmse_jax():
        pred, _ = resnet.keypoint_cnn_apply(
            params, stats, jnp.asarray(x_val), train=False, compute_dtype=jnp.float32
        )
        return _px_rmse(np.asarray(pred), y_val, h, w)

    def _px_rmse(pred, target, h, w):
        dp = (pred - target).reshape(pred.shape[0], -1, 2)
        dp = dp * np.array([(w - 1) / 2.0, (h - 1) / 2.0], np.float32)
        return float(np.sqrt(np.mean(np.sum(dp**2, axis=-1))))

    rmse_t, rmse_j = px_rmse_torch(), px_rmse_jax()

    # ---- round-trip: trained JAX weights -> torch model -> equal logits -
    sd_back = convert.to_torch_state_dict(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats)
    )
    rt_model = TorchKeypointCNN(n_keypoints=cfg.n_keypoints, num_channels=cfg.in_channels)
    rt_model.load_state_dict(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd_back.items()}
    )
    rt_model.eval()
    xb = x_val[:8]
    with torch.no_grad():
        rt_logits = rt_model(torch.from_numpy(np.transpose(xb, (0, 3, 1, 2)))).numpy()
    jx_logits, _ = resnet.keypoint_cnn_apply(
        params, stats, jnp.asarray(xb), train=False, compute_dtype=jnp.float32
    )
    roundtrip_max_abs = float(np.max(np.abs(rt_logits - np.asarray(jx_logits))))

    result = {
        "torch_val_rmse_px": rmse_t,
        "jax_val_rmse_px": rmse_j,
        "rmse_ratio": rmse_j / max(rmse_t, 1e-9),
        "roundtrip_logits_max_abs_diff": roundtrip_max_abs,
        "final_losses": history[-1],
        "augmented": cfg.augmented,
        "epochs": cfg.epochs,
        "n_train": int(n),
        "n_val": int(len(x_val)),
    }
    print(json.dumps(result))
    if cfg.output_json:
        os.makedirs(os.path.dirname(cfg.output_json) or ".", exist_ok=True)
        with open(cfg.output_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def main() -> None:
    from perseus_tpu.configs.cli import cli

    run_parity(cli(ParityConfig))


if __name__ == "__main__":
    main()
