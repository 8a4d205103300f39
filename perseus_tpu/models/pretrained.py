"""Pretrained-backbone initialization from a torchvision ResNet-18 checkpoint.

The reference always fine-tunes ImageNet1K-pretrained torchvision weights
(reference: perseus/detector/models.py:20 — ``resnet18(weights=IMAGENET1K_V1)``
with conv1 swapped for ``num_channels != 3`` and fc replaced by the
``2*n_keypoints`` head). torchvision is not installed in this build
environment, so this module provides the same initialization from a
user-supplied torchvision ``resnet18`` state-dict file: download
``https://download.pytorch.org/models/resnet18-f37072fd.pth`` on any
machine with network access and pass its path as
``TrainConfig.init_checkpoint`` (detected by key layout) or call
:func:`adapt_torchvision_resnet18` directly.

Matches the reference's semantics exactly: backbone weights and BN running
stats come from the checkpoint; ``conv1`` (when ``num_channels != 3``) and
``fc`` are freshly initialized with torch's default inits, because the
reference's module replacement discards their pretrained values too.
"""

from __future__ import annotations

import numpy as np

from perseus_tpu.models import convert

__all__ = ["adapt_torchvision_resnet18", "looks_like_torchvision_resnet18"]


def looks_like_torchvision_resnet18(state_dict: dict) -> bool:
    """A bare torchvision classifier checkpoint: 1000-way fc, no ``resnet.``
    nesting."""
    keys = set(state_dict.keys())
    return (
        "conv1.weight" in keys
        and "fc.weight" in keys
        and getattr(state_dict["fc.weight"], "shape", (0, 0))[0] == 1000
    )


def adapt_torchvision_resnet18(
    state_dict: dict,
    n_keypoints: int = 8,
    num_channels: int = 4,
    seed: int = 0,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """torchvision resnet18 state-dict (numpy values) -> (params, stats)
    for the keypoint CNN, reproducing the reference's constructor:

      * backbone convs/BNs/running stats: from the checkpoint,
      * ``conv1``: kept when ``num_channels == 3``, else re-initialized
        (kaiming fan-out normal, torch's conv default) at the new width,
      * ``fc``: re-initialized at ``2*n_keypoints`` outputs (torch Linear
        default uniform).
    """
    import jax
    import jax.numpy as jnp

    from perseus_tpu.models import resnet

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params, stats = convert.from_torch_state_dict(sd)

    fresh_params, _ = resnet.init_keypoint_cnn(
        jax.random.key(seed), n_keypoints=n_keypoints, num_channels=num_channels
    )
    if num_channels != 3:
        params["conv1.weight"] = np.asarray(fresh_params["conv1.weight"])
    params["fc.weight"] = np.asarray(fresh_params["fc.weight"])
    params["fc.bias"] = np.asarray(fresh_params["fc.bias"])
    return params, stats


def load_pretrained_checkpoint(
    path: str, n_keypoints: int = 8, num_channels: int = 4, seed: int = 0
):
    """Loads a ``.pth`` that may be either a reference keypoint checkpoint
    or a bare torchvision resnet18 classifier; adapts the latter."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in state_dict.items()}
    if looks_like_torchvision_resnet18(sd):
        return adapt_torchvision_resnet18(sd, n_keypoints, num_channels, seed)
    return convert.from_torch_state_dict(sd)
