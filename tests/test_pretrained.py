"""Pretrained-backbone adaptation: a bare torchvision resnet18 classifier
state-dict initializes the keypoint CNN the way the reference's constructor
does (backbone kept, conv1/fc replaced; models.py:20)."""

import numpy as np
import torch

from perseus_tpu.eval.torch_oracle import ResNet18
from perseus_tpu.models.pretrained import (
    adapt_torchvision_resnet18,
    looks_like_torchvision_resnet18,
)


def _fake_torchvision_sd():
    torch.manual_seed(0)
    model = ResNet18(num_channels=3, num_outputs=1000)  # classifier layout
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    return {k: v.numpy() for k, v in model.state_dict().items()}


def test_detects_torchvision_layout():
    sd = _fake_torchvision_sd()
    assert looks_like_torchvision_resnet18(sd)
    sd2 = dict(sd)
    sd2["fc.weight"] = sd["fc.weight"][:16]
    assert not looks_like_torchvision_resnet18(sd2)


def test_adapt_keeps_backbone_replaces_head():
    import jax.numpy as jnp

    from perseus_tpu.models import resnet

    sd = _fake_torchvision_sd()
    params, stats = adapt_torchvision_resnet18(sd, n_keypoints=8, num_channels=4)

    # backbone conv kept (OIHW -> HWIO)
    np.testing.assert_allclose(
        params["layer1.0.conv1.weight"],
        np.transpose(sd["layer1.0.conv1.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_allclose(stats["bn1.running_mean"], sd["bn1.running_mean"])
    # conv1/fc replaced at the new shapes
    assert params["conv1.weight"].shape == (7, 7, 4, 64)
    assert params["fc.weight"].shape == (512, 16)

    # and the adapted model runs
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    out, _ = resnet.keypoint_cnn_apply(
        {k: jnp.asarray(v) for k, v in params.items()},
        {k: jnp.asarray(v) for k, v in stats.items()},
        x,
    )
    assert out.shape == (1, 16)
