"""Real-image qualitative validation: RGB-only eval on a directory of PNGs.

Output-fidelity equivalent of the reference's validate_real script
(reference: perseus/detector/validate_real.py): loads PNGs (skipping
``*segmentation*``), resizes to 1.8x model height then center-crops to
(H, W), runs the detector, denormalizes predictions, renders per-image
scatter overlays, and assembles a GIF.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import ROOT
from perseus_tpu.camera import center_crop_hw, denormalize_pixel_coordinates
from perseus_tpu.data.dataset import KeypointDatasetConfig
from perseus_tpu.data.schema import load_rgb_png
from perseus_tpu.models import resnet
from perseus_tpu.train import checkpoint as ckpt

__all__ = ["ValConfig", "validate", "main"]


@dataclass(frozen=True)
class ValConfig:
    """Validation configuration (reference: validate_real.py:24-33)."""

    model_path: str = f"{ROOT}/outputs/models/latest"
    in_channels: int = 3
    dataset_cfg: KeypointDatasetConfig = field(
        default_factory=lambda: KeypointDatasetConfig(dataset_path=f"{ROOT}/data/real_imgs")
    )
    save_every: int = 1
    amp: bool = True
    model_h: int = 256
    model_w: int = 256


def _resize_bilinear(image: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    return jax.image.resize(image, (new_h, new_w, image.shape[-1]), method="bilinear")


def validate(cfg: ValConfig) -> list[str]:
    """Returns the list of written overlay figure paths."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    ckpt_name = os.path.basename(str(cfg.model_path)).split(".")[0]
    out_dir = Path(f"{ROOT}/outputs/figures/{ckpt_name}")
    (out_dir / "real").mkdir(parents=True, exist_ok=True)

    params, stats = ckpt.load_model(cfg.model_path)
    folded = resnet.fold_batchnorm(
        jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, stats)
    )
    compute_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    h, w = cfg.model_h, cfg.model_w
    n_keypoints = folded["fc.bias"].shape[0] // 2

    @jax.jit
    def infer(image):  # (H', W', 3) already resized+cropped
        pred = resnet.keypoint_cnn_apply_folded(folded, image[None], compute_dtype=compute_dtype)
        return denormalize_pixel_coordinates(pred.reshape(-1, 2), h, w)

    image_files = sorted(Path(cfg.dataset_cfg.dataset_path).glob("*.png"))
    image_files = [f for f in image_files if "segmentation" not in str(f)]

    written = []
    for ii, image_file in enumerate(image_files):
        if ii % cfg.save_every != 0:
            continue
        image = jnp.asarray(load_rgb_png(str(image_file)))
        if image.shape[:2] != (h, w):
            scale = int(1.8 * h)
            new_w = max(int(round(image.shape[1] * scale / image.shape[0])), scale)
            image = _resize_bilinear(image, scale, new_w)
            image = center_crop_hw(image, h, w)
        pred_px = np.asarray(infer(image))

        fig, ax = plt.subplots(figsize=(4, 4))
        ax.imshow(np.clip(np.asarray(image), 0, 1))
        jet = plt.cm.jet(np.linspace(0, 1, n_keypoints))
        for jj in range(n_keypoints):
            ax.scatter(pred_px[jj, 0], pred_px[jj, 1], c=[jet[jj]], alpha=0.8)
        ax.set_title(f"Image {ii} / {len(image_files)}")
        path = str(out_dir / f"val_{ii}.png")
        fig.savefig(path)
        plt.close(fig)
        written.append(path)

    if written:
        import imageio.v3 as imageio

        frames = [imageio.imread(p) for p in written]
        min_h = min(f.shape[0] for f in frames)
        min_w = min(f.shape[1] for f in frames)
        stacked = np.stack([f[:min_h, :min_w] for f in frames])
        imageio.imwrite(str(out_dir / "real" / "val.gif"), stacked, loop=0, fps=5)
    return written


def main() -> None:
    from perseus_tpu.configs.cli import cli

    validate(cli(ValConfig))


if __name__ == "__main__":
    main()
