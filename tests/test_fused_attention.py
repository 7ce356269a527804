"""Fused Pallas attention vs the dense jnp reference (interpret mode on
CPU; the same kernel runs compiled on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synergize_motion_appearance_tpu.ops.fused_attention import (
    _dense_reference,
    _fused_attention_pallas,
    fused_attention,
)


@pytest.mark.parametrize(
    "B,H,L,K,d,masked",
    [
        (2, 4, 64, 64, 4, False),
        pytest.param(2, 4, 64, 16, 8, False, marks=pytest.mark.slow),
        (1, 8, 128, 128, 32, True),
        pytest.param(3, 2, 64, 48, 16, True, marks=pytest.mark.slow),
    ],
)
def test_fused_attention_matches_dense(B, H, L, K, d, masked):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, L, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, K, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, K, d), jnp.float32)
    bias = None
    if masked:
        mask = jax.random.bernoulli(ks[3], 0.3, (B, K))
        bias = jnp.where(mask, -1e30, 0.0).astype(jnp.float32)
    ref = _dense_reference(q, k, v, bias)
    out = _fused_attention_pallas(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_all_masked_rows_zero():
    """bias -inf on every key -> output rows are exactly 0 (the dense
    path's nan_to_num guard)."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, H, L, K, d = 1, 1, 8, 16, 4
    q = jax.random.normal(ks[0], (B, H, L, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, K, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, K, d), jnp.float32)
    bias = jnp.full((B, K), -1e30, jnp.float32)
    out = _fused_attention_pallas(q, k, v, bias, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_fused_attention_grad_matches_dense():
    """custom_vjp backward (dense recompute) == grads of the reference."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    B, H, L, K, d = 1, 2, 16, 24, 4
    q = jax.random.normal(ks[0], (B, H, L, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, K, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, K, d), jnp.float32)

    g1 = jax.grad(lambda q_: jnp.sum(fused_attention(q_, k, v) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(_dense_reference(q_, k, v, None) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)
