"""Golden tests for the Pallas fused maxpool (models/pool_pallas.py).

Oracles (both XLA, both tested against torch elsewhere):
  * forward: jax.lax.reduce_window max (resnet._reduce_window_max_3x3_s2)
  * gradient: the comparison-VJP decomposition (resnet._max_pool_3x3_s2_cmp)
    — IDENTICAL tie semantics to the kernel, so f32 comparisons are exact;
    select-and-scatter differs only in multi-window accumulation order.

Runs the kernels through the Pallas interpreter (CPU); the on-chip compile
is exercised by the TPU train step itself (resnet.MAXPOOL_PALLAS).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perseus_tpu.models import resnet
from perseus_tpu.models.pool_pallas import max_pool_3x3_s2_pallas

pytestmark = pytest.mark.quick


SHAPES = [(3, 16, 24, 5), (2, 128, 128, 64), (1, 8, 8, 3), (2, 64, 32, 16)]


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_reduce_window_exactly(shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape).astype(np.float32))
    ref = resnet._reduce_window_max_3x3_s2(x)
    out = max_pool_3x3_s2_pallas(x)
    assert out.shape == ref.shape
    assert bool(jnp.all(ref == out))


@pytest.mark.parametrize("shape", SHAPES)
def test_gradient_matches_cmp_oracle_exactly_f32(shape):
    rng = np.random.default_rng(1)
    # ReLU'd input: includes the exact-zero tie class the train step produces
    x = jnp.maximum(jnp.asarray(rng.normal(size=shape).astype(np.float32)), 0.0)
    g = jnp.asarray(
        rng.normal(size=(shape[0], shape[1] // 2, shape[2] // 2, shape[3])).astype(
            np.float32
        )
    )
    _, vjp_ref = jax.vjp(resnet._max_pool_3x3_s2_cmp, x)
    _, vjp_new = jax.vjp(lambda t: max_pool_3x3_s2_pallas(t), x)
    assert bool(jnp.all(vjp_ref(g)[0] == vjp_new(g)[0]))


def test_bf16_forward_exact_and_gradient_close():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 8))).astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(2, 16, 16, 8))).astype(jnp.bfloat16)
    assert bool(
        jnp.all(resnet._reduce_window_max_3x3_s2(x) == max_pool_3x3_s2_pallas(x))
    )
    # gradient: the kernel accumulates multi-window contributions in f32 and
    # rounds once; the bf16 oracle rounds after every add. Differences are
    # confined to multi-covered (odd row/col) positions at ~1-ulp scale.
    _, vjp_ref = jax.vjp(resnet._max_pool_3x3_s2_cmp, x)
    _, vjp_new = jax.vjp(lambda t: max_pool_3x3_s2_pallas(t), x)
    a = vjp_new(g)[0].astype(jnp.float32)
    b = vjp_ref(g)[0].astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.05, rtol=0.2)
    assert float(jnp.mean((a != b).astype(jnp.float32))) < 0.02


def test_resnet_train_forward_unchanged_by_dispatch():
    """The CPU dispatch keeps reduce_window, so keypoint_cnn_apply output is
    invariant to the MAXPOOL_PALLAS toggle off-TPU."""
    key = jax.random.key(0)
    params, stats = resnet.init_keypoint_cnn(key, 8, 4)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 4))
    old = resnet.MAXPOOL_PALLAS
    try:
        resnet.MAXPOOL_PALLAS = True
        out1, _ = resnet.keypoint_cnn_apply(params, stats, x, train=True)
        resnet.MAXPOOL_PALLAS = False
        out2, _ = resnet.keypoint_cnn_apply(params, stats, x, train=True)
    finally:
        resnet.MAXPOOL_PALLAS = old
    assert bool(jnp.all(out1 == out2))


def test_interpreter_path_equals_xla_in_model_context():
    """Full maxpool layer swap on CPU via the interpreter: same values."""
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, size=(2, 32, 32, 6)).astype(np.float32)
    )
    a = resnet._reduce_window_max_3x3_s2(x)
    b = max_pool_3x3_s2_pallas(x, None)  # interpret auto-selected (CPU)
    assert bool(jnp.all(a == b))
