"""Differential tests for the comparison-based maxpool VJP.

The round-4 profile measured XLA's select-and-scatter maxpool gradient at
2.15 ms/step (~3x HBM roofline); models/resnet.py replaces it with a
parity-decomposed comparison backward. These tests pin the replacement to
the select-and-scatter oracle bit-for-bit on tie-free inputs (the training
regime: continuous float activations), on every dtype the train step uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perseus_tpu.models.resnet import (
    _max_pool_3x3_s2,
    _max_pool_3x3_s2_cmp,
    _reduce_window_max_3x3_s2,
)


def _rand(shape, dtype, seed=0):
    # distinct values with NO ties in the target dtype: v_k = (1 + m/128)*2^e
    # with m a 7-bit mantissa is exactly representable in bfloat16 (7 stored
    # mantissa bits) and float32, so a permutation of these stays a
    # permutation after the cast. This is the float-activation regime where
    # the comparison backward must match select-and-scatter's argmax routing
    # exactly.
    rng = np.random.default_rng(seed)
    k = rng.permutation(int(np.prod(shape)))
    vals = ((1.0 + (k % 128) / 128.0) * np.exp2(k // 128)).astype(np.float32)
    return jnp.asarray(vals.reshape(shape), dtype)


def _int_grad(shape, dtype, seed=0):
    # small-integer cotangents: every per-position sum of covering-window
    # terms is exactly representable in bf16/f32, so the comparison
    # backward's different summation order still matches select-and-scatter
    # bit-for-bit (a position can be the max of up to four windows)
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(-8, 9, size=shape).astype(np.float32), dtype
    )


@pytest.mark.quick
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 12, 4)])
def test_maxpool_cmp_matches_select_and_scatter(dtype, shape):
    x = _rand(shape, dtype, seed=shape[1])
    y_ref, vjp_ref = jax.vjp(_reduce_window_max_3x3_s2, x)
    y_new, vjp_new = jax.vjp(_max_pool_3x3_s2_cmp, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
    g = _int_grad(y_ref.shape, y_ref.dtype, seed=7)
    (dx_ref,) = vjp_ref(g)
    (dx_new,) = vjp_new(g)
    np.testing.assert_array_equal(
        np.asarray(dx_ref, np.float32), np.asarray(dx_new, np.float32)
    )


@pytest.mark.quick
def test_maxpool_wrapper_dispatch():
    """Even H/W uses the custom VJP; odd falls back to reduce_window (whose
    select-and-scatter gradient is still exact)."""
    x_even = _rand((1, 8, 8, 2), jnp.float32, seed=1)
    x_odd = _rand((1, 9, 8, 2), jnp.float32, seed=2)
    # both paths produce the correct forward
    np.testing.assert_array_equal(
        np.asarray(_max_pool_3x3_s2(x_even)),
        np.asarray(_reduce_window_max_3x3_s2(x_even)),
    )
    np.testing.assert_array_equal(
        np.asarray(_max_pool_3x3_s2(x_odd)),
        np.asarray(_reduce_window_max_3x3_s2(x_odd)),
    )
    # grad flows through both
    for x in (x_even, x_odd):
        dx = jax.grad(lambda a: jnp.sum(_max_pool_3x3_s2(a) ** 2))(x)
        assert np.isfinite(np.asarray(dx)).all()


@pytest.mark.quick
def test_maxpool_tie_gradient_is_conservative_after_relu():
    """The one real tie class (multiple exact zeros after ReLU) must not
    leak duplicated gradient once composed with ReLU, because ReLU's VJP
    kills gradient at x <= 0 — the composition the ResNet stem uses."""
    x = jnp.asarray(
        np.array([[-1.0, -2.0, -3.0, -4.0], [0.5, -1.0, -2.0, -3.0],
                  [-1.0, -1.0, -2.0, -2.0], [-3.0, -2.0, -1.0, -4.0]],
                 np.float32)[None, :, :, None]
    )

    def f(a):
        return jnp.sum(_max_pool_3x3_s2(jax.nn.relu(a)))

    def f_ref(a):
        return jnp.sum(_reduce_window_max_3x3_s2(jax.nn.relu(a)))

    np.testing.assert_array_equal(
        np.asarray(jax.grad(f)(x)), np.asarray(jax.grad(f_ref)(x))
    )
