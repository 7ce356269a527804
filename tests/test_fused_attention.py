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


def test_fused_attention_shared_kv_matches_broadcast():
    """k/v passed as (1,H,K,d) (batch-shared codebook context) must equal
    the explicitly broadcast (B,H,K,d) call."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    B, H, L, K, d = 3, 2, 16, 32, 8
    q = jax.random.normal(ks[0], (B, H, L, d), jnp.float32)
    k = jax.random.normal(ks[1], (1, H, K, d), jnp.float32)
    v = jax.random.normal(ks[2], (1, H, K, d), jnp.float32)
    shared = _fused_attention_pallas(q, k, v, None, interpret=True)
    kb = jnp.broadcast_to(k, (B, H, K, d))
    vb = jnp.broadcast_to(v, (B, H, K, d))
    dense = _fused_attention_pallas(q, kb, vb, None, interpret=True)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(dense),
                               atol=1e-6, rtol=1e-6)
    # dense reference handles the shared shape too (CPU fallback path)
    ref = _dense_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mha_unbatched_context_matches_batched():
    """MultiheadAttention with (K, E) context == the (B, K, E) broadcast
    (the codebook cross-attention path)."""
    from synergize_motion_appearance_tpu.models.transformer import (
        MultiheadAttention,
    )

    B, L, K, E = 2, 12, 20, 32
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    q = jax.random.normal(ks[0], (B, L, E), jnp.float32)
    ctx = jax.random.normal(ks[1], (K, E), jnp.float32)
    m = MultiheadAttention(E, 4)
    vars_ = m.init(jax.random.PRNGKey(5), q, ctx, ctx)
    out_u = m.apply(vars_, q, ctx, ctx)
    ctx_b = jnp.broadcast_to(ctx[None], (B, K, E))
    out_b = m.apply(vars_, q, ctx_b, ctx_b)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_b),
                               atol=2e-6, rtol=2e-6)


# ---------------------------------------------------------------------------
# Head-packed variant: (B, L, E) in/out, heads split inside the kernel
# ---------------------------------------------------------------------------
from synergize_motion_appearance_tpu.ops.fused_attention import (  # noqa: E402
    _dense_reference_packed,
    _fused_attention_packed_pallas,
    fused_attention_packed,
)


@pytest.mark.parametrize(
    "B,H,L,K,E,masked,shared",
    [
        (2, 8, 64, 64, 32, False, False),   # motion dims: d=4
        (1, 8, 128, 128, 256, False, True), # app dims: d=32, shared ctx
        pytest.param(2, 4, 64, 48, 64, True, False,
                     marks=pytest.mark.slow),
        pytest.param(3, 2, 32, 16, 16, True, True,
                     marks=pytest.mark.slow),
    ],
)
def test_packed_attention_matches_dense(B, H, L, K, E, masked, shared):
    ks = jax.random.split(jax.random.PRNGKey(10), 4)
    q = jax.random.normal(ks[0], (B, L, E), jnp.float32)
    kshape = (K, E) if shared else (B, K, E)
    k = jax.random.normal(ks[1], kshape, jnp.float32)
    v = jax.random.normal(ks[2], kshape, jnp.float32)
    bias = None
    if masked:
        mask = jax.random.bernoulli(ks[3], 0.3, (B, K))
        bias = jnp.where(mask, -1e30, 0.0).astype(jnp.float32)
    ref = _dense_reference_packed(H, q, k, v, bias)
    out = _fused_attention_packed_pallas(H, q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_packed_attention_equals_headsplit_path():
    """The packed entry must produce the same values as the original
    (B, H, L, d)-layout math (the head split/merge is pure relayout)."""
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    B, H, L, K, E = 2, 8, 32, 48, 32
    d = E // H
    q = jax.random.normal(ks[0], (B, L, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, K, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, K, E), jnp.float32)
    packed = _dense_reference_packed(H, q, k, v, None)
    qh = q.reshape(B, L, H, d).transpose(0, 2, 1, 3)
    kh = k.reshape(B, K, H, d).transpose(0, 2, 1, 3)
    vh = v.reshape(B, K, H, d).transpose(0, 2, 1, 3)
    ref = _dense_reference(qh, kh, vh, None)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, L, E)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_packed_attention_grad_matches_dense():
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    B, H, L, K, E = 1, 4, 16, 24, 16
    q = jax.random.normal(ks[0], (B, L, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, K, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, K, E), jnp.float32)
    g1 = jax.grad(lambda q_: jnp.sum(
        fused_attention_packed(q_, k, v, num_heads=H) ** 2))(q)
    g2 = jax.grad(lambda q_: jnp.sum(
        _dense_reference_packed(H, q_, k, v, None) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_packed_attention_all_masked_rows_zero():
    ks = jax.random.split(jax.random.PRNGKey(13), 3)
    B, H, L, K, E = 1, 2, 8, 16, 8
    q = jax.random.normal(ks[0], (B, L, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, K, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, K, E), jnp.float32)
    bias = jnp.full((B, K), -1e30, jnp.float32)
    out = _fused_attention_packed_pallas(H, q, k, v, bias, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
