"""Differential tests: JAX keypoint CNN vs. a torch ResNet-18 oracle.

This is the parity gate SURVEY.md section 7 step 2 calls for: identical
logits from a converted checkpoint, in eval mode (running stats) and train
mode (batch stats + running-stat update).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from perseus_tpu.models import convert, resnet
from tests.torch_resnet_oracle import TorchKeypointCNN

RNG = np.random.default_rng(7)


def _make_pair(num_channels: int, n_keypoints: int = 8, seed: int = 0):
    torch.manual_seed(seed)
    torch_model = TorchKeypointCNN(n_keypoints=n_keypoints, num_channels=num_channels)
    # randomize BN running stats so eval-mode parity is a real test
    with torch.no_grad():
        for module in torch_model.modules():
            if isinstance(module, torch.nn.BatchNorm2d):
                module.running_mean.normal_(0.0, 0.1)
                module.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert.from_torch_state_dict(sd)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    return torch_model, params, stats


def test_eval_mode_parity_f64():
    """The semantic parity gate: in float64 both implementations must agree
    to near machine precision — any layer-semantics mismatch (padding, BN
    formula, pooling) would show up at O(1), not O(1e-12)."""
    torch_model, params, stats = _make_pair(4)
    torch_model.double().eval()
    params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    stats = jax.tree.map(lambda a: a.astype(jnp.float64), stats)

    x = RNG.uniform(0, 1, size=(2, 4, 64, 64))
    with torch.no_grad():
        torch_out = torch_model(torch.from_numpy(x)).numpy()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    jax_out, _ = resnet.keypoint_cnn_apply(
        params, stats, x_nhwc, train=False, compute_dtype=jnp.float64
    )
    np.testing.assert_allclose(np.asarray(jax_out), torch_out, atol=1e-10)

    folded = resnet.fold_batchnorm(params, stats)
    jax_folded = resnet.keypoint_cnn_apply_folded(folded, x_nhwc, compute_dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(jax_folded), torch_out, atol=1e-9)


@pytest.mark.parametrize("num_channels", [3, 4])
def test_eval_mode_parity(num_channels):
    torch_model, params, stats = _make_pair(num_channels)
    torch_model.eval()

    x = RNG.uniform(0, 1, size=(2, num_channels, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_out = torch_model(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    jax_out, _ = resnet.keypoint_cnn_apply(params, stats, x_nhwc, train=False)
    # f32 summation-order drift compounds over 18 conv/BN layers (the f64
    # test above pins exact semantics); observed ~6e-4 on random weights
    np.testing.assert_allclose(np.asarray(jax_out), torch_out, atol=2e-3)

    folded = resnet.fold_batchnorm(params, stats)
    jax_folded = resnet.keypoint_cnn_apply_folded(folded, x_nhwc, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(jax_folded), torch_out, atol=2e-3)


def test_train_mode_parity():
    torch_model, params, stats = _make_pair(3, seed=1)
    torch_model.train()

    x = RNG.uniform(0, 1, size=(4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_out = torch_model(torch.from_numpy(x)).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    jax_out, new_stats = resnet.keypoint_cnn_apply(params, stats, x_nhwc, train=True)
    np.testing.assert_allclose(np.asarray(jax_out), torch_out, atol=2e-3)

    # running-stat updates must match torch's momentum rule
    torch_sd = convert.normalize_torch_keys(
        {k: v.numpy() for k, v in torch_model.state_dict().items()}
    )
    for key in ["bn1.running_mean", "bn1.running_var", "layer3.0.bn2.running_mean"]:
        np.testing.assert_allclose(
            np.asarray(new_stats[key]), torch_sd[key], atol=1e-5, err_msg=key
        )


def test_state_dict_roundtrip():
    torch_model, params, stats = _make_pair(4, seed=2)
    sd_back = convert.to_torch_state_dict(
        jax.tree.map(np.asarray, params), jax.tree.map(np.asarray, stats)
    )
    sd_orig = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    assert set(sd_back.keys()) == set(sd_orig.keys())
    for key, value in sd_orig.items():
        np.testing.assert_allclose(sd_back[key], value, atol=0, err_msg=key)


def test_init_shapes_match_torch():
    """Freshly initialized JAX params have exactly the converted-torch shapes."""
    torch_model, params, stats = _make_pair(4)
    init_params, init_stats = resnet.init_keypoint_cnn(
        jax.random.key(0), n_keypoints=8, num_channels=4
    )
    assert resnet.param_shapes(init_params) == resnet.param_shapes(params)
    assert resnet.param_shapes(init_stats) == resnet.param_shapes(stats)


def test_ddp_module_prefix_stripped():
    torch_model, _, _ = _make_pair(3)
    sd = {f"module.{k}": v.numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert.from_torch_state_dict(sd)
    assert "conv1.weight" in params
    assert "bn1.running_mean" in stats


def test_space_to_depth_stem_equivalent():
    """The 4x4/s1 space-to-depth stem must equal the 7x7/s2 stem
    numerically (folded inference path)."""
    from perseus_tpu.models import resnet

    params, stats = resnet.init_keypoint_cnn(jax.random.key(5), 8, 4)
    folded = resnet.fold_batchnorm(params, stats)
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 4)).astype(np.float32))
    a = resnet.keypoint_cnn_apply_folded(folded, x, compute_dtype=jnp.float32, s2d_stem=False)
    b = resnet.keypoint_cnn_apply_folded(folded, x, compute_dtype=jnp.float32, s2d_stem=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_space_to_depth_stem_train_grads_equivalent():
    """TrainConfig.s2d_stem: the training path with the space-to-depth stem
    must match the plain 7x7/s2 stem in loss, BN stat updates, AND the
    parameter gradients — in particular conv1.weight's gradient must route
    back through the kernel rearrangement exactly."""
    from perseus_tpu.models import resnet

    params, stats = resnet.init_keypoint_cnn(jax.random.key(7), 8, 4)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 4)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (2, 16)).astype(np.float32))

    def loss(p, s2d):
        out, new_stats = resnet.keypoint_cnn_apply(
            p, stats, x, train=True, compute_dtype=jnp.float32, s2d_stem=s2d
        )
        return jnp.mean((out - tgt) ** 2), new_stats

    (la, sa), ga = jax.value_and_grad(loss, has_aux=True)(params, False)
    (lb, sb), gb = jax.value_and_grad(loss, has_aux=True)(params, True)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
    for k in sa:
        np.testing.assert_allclose(np.asarray(sa[k]), np.asarray(sb[k]), atol=1e-5, err_msg=k)
    for k in ga:
        np.testing.assert_allclose(
            np.asarray(ga[k]), np.asarray(gb[k]), atol=2e-4, rtol=1e-3, err_msg=k
        )
