"""TPU-only Mosaic-lowering smoke tests (VERDICT r1 weak #7).

Numeric parity of every Pallas kernel is covered in interpret mode by
tests/test_kernels.py; what that can't catch is a Mosaic LOWERING
regression (tiling rules, VMEM limits, remote-compile size) — those only
surface when the kernel actually compiles for a TPU. Each test here runs
one kernel non-interpreted on small-but-tiling-realistic shapes and
checks against the XLA formulation.

Run on the bench chip:  ISTVT_TEST_TPU=1 python -m pytest -m tpu -q
(the default addopts deselect these; tests/conftest.py leaves the real
platform alone when ISTVT_TEST_TPU is set).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU")

# tiling-realistic geometry: S padded to a sublane multiple like the
# model's fused path (362 -> 368), full head count, bf16
B, T1, S, H, DH = 2, 7, 368, 8, 64
INNER = H * DH
N_VALID = 362


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) \
        .astype(dtype)


def _assert_close_bf16(got, want, rel_l2=1e-2, max_frac=0.02):
    """Scale-aware closeness for large bf16 tensors: elementwise
    atol/rtol misfires on the handful of entries where two valid bf16
    accumulation orders round differently (measured: 12 / 7.9M elements
    at |diff| ~2% of max|want|). Require small relative L2 error AND
    max deviation bounded by a fraction of the tensor's scale."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    l2 = np.linalg.norm(g - w) / max(np.linalg.norm(w), 1e-9)
    assert l2 < rel_l2, f"relative L2 {l2}"
    scale = np.abs(w).max()
    assert np.abs(g - w).max() < max_frac * scale, \
        (np.abs(g - w).max(), scale)


@requires_tpu
def test_spatial_packed_forward_tpu():
    from istvt_tpu.kernels.attention import (
        _spatial_packed_reference, fused_frame_attention_packed)
    qkv = _rand(0, (B * T1, S, 3 * INNER))
    got = fused_frame_attention_packed(qkv, heads=H, n_valid=N_VALID)
    want = _spatial_packed_reference(qkv, H, N_VALID)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


@requires_tpu
def test_spatial_packed_backward_tpu():
    from istvt_tpu.kernels.attention import (
        _spatial_packed_reference, spatial_attention_packed)
    qkv = _rand(1, (B, S, 3 * INNER))

    f_ker = lambda u: jnp.sum(spatial_attention_packed(u, H, N_VALID)
                              .astype(jnp.float32) ** 2)
    f_ref = lambda u: jnp.sum(_spatial_packed_reference(u, H, N_VALID)
                              .astype(jnp.float32) ** 2)
    g_ker = jax.jit(jax.grad(f_ker))(qkv)
    g_ref = jax.jit(jax.grad(f_ref))(qkv)
    _assert_close_bf16(g_ker, g_ref)


@requires_tpu
def test_temporal_packed_forward_tpu():
    from istvt_tpu.kernels.attention import (
        _temporal_packed_reference, fused_temporal_attention_packed)
    qkv = _rand(2, (B, T1, S, 3 * INNER))
    got = fused_temporal_attention_packed(qkv, heads=H)
    want = _temporal_packed_reference(qkv, H)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


@requires_tpu
def test_temporal_packed_backward_tpu():
    from istvt_tpu.kernels.attention import (
        _temporal_packed_reference, temporal_attention_packed)
    qkv = _rand(3, (B, T1, S, 3 * INNER))
    f_ker = lambda u: jnp.sum(temporal_attention_packed(u, H)
                              .astype(jnp.float32) ** 2)
    f_ref = lambda u: jnp.sum(_temporal_packed_reference(u, H)
                              .astype(jnp.float32) ** 2)
    g_ker = jax.jit(jax.grad(f_ker))(qkv)
    g_ref = jax.jit(jax.grad(f_ref))(qkv)
    _assert_close_bf16(g_ker, g_ref)


@requires_tpu
def test_temporal_folded_f32_tile_rule_tpu():
    """ADVICE r1 #3 regression: the folded-(s,h) kernel at the paper
    geometry in f32 must pick a legal (multiple-of-8) location tile."""
    from istvt_tpu.kernels.attention import fused_temporal_attention
    q = _rand(4, (1, T1, 362, INNER), jnp.float32)
    k = _rand(5, (1, T1, 362, INNER), jnp.float32)
    v = _rand(6, (1, T1, 362, INNER), jnp.float32)
    out = fused_temporal_attention(q, k, v, heads=H)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


@requires_tpu
def test_ln_matmul_tpu():
    from istvt_tpu.kernels.linear import _ln_matmul_reference, ln_matmul
    x = _rand(7, (B * T1 * S, 728))
    s = _rand(8, (728,), jnp.float32) * 0.1 + 1.0
    b = _rand(9, (728,), jnp.float32) * 0.1
    w = _rand(10, (728, 3 * INNER))
    got = ln_matmul(x, s, b, w)
    want = _ln_matmul_reference(x, s, b, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@requires_tpu
def test_matmul_bias_residual_tpu():
    from istvt_tpu.kernels.linear import (
        _matmul_bias_reference, matmul_bias_residual)
    x = _rand(11, (B * T1 * S, INNER))
    w = _rand(12, (INNER, 728))
    b = _rand(13, (728,), jnp.float32) * 0.1
    r = _rand(14, (B * T1 * S, 728))
    got = matmul_bias_residual(x, w, b, r)
    want = _matmul_bias_reference(x, w, b.astype(x.dtype), r)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


@requires_tpu
def test_fused_ff_tpu():
    from istvt_tpu.kernels.mlp import _ff_reference, fused_ff
    x = _rand(15, (B * T1, S, 728))
    w1 = _rand(16, (728, 2912)) * jnp.bfloat16(0.05)  # realistic init scale
    b1 = _rand(17, (2912,), jnp.float32) * 0.1
    w2 = _rand(18, (2912, 728)) * jnp.bfloat16(0.05)
    b2 = _rand(19, (728,), jnp.float32) * 0.1
    got = fused_ff(x, w1, b1, w2, b2)
    want = _ff_reference(x, w1, b1, w2, b2)
    _assert_close_bf16(got, want)


@requires_tpu
def test_ln_ff_residual_tpu():
    from istvt_tpu.kernels.mlp import ln_ff_residual
    from istvt_tpu.nn.layers import layernorm, linear
    gelu = lambda u: jax.nn.gelu(u, approximate=True)  # kernel's GELU
    x = _rand(20, (B * T1, S, 728))
    s = _rand(21, (728,), jnp.float32) * 0.1 + 1.0
    b = _rand(22, (728,), jnp.float32) * 0.1
    w1 = _rand(23, (728, 2912)) * jnp.bfloat16(0.05)
    b1 = _rand(24, (2912,), jnp.float32) * 0.1
    w2 = _rand(25, (2912, 728)) * jnp.bfloat16(0.05)
    b2 = _rand(26, (728,), jnp.float32) * 0.1
    got = ln_ff_residual(x, s, b, w1, b1, w2, b2)
    h = layernorm({"scale": s, "bias": b}, x)
    h = linear({"w": w2, "b": b2},
               gelu(linear({"w": w1, "b": b1}, h)))
    want = h + x
    _assert_close_bf16(got, want)


@requires_tpu
def test_ln_matmul_bwd_tpu():
    from istvt_tpu.kernels.linear import (
        _ln_matmul_bwd_impl, _ln_matmul_reference)
    x = _rand(27, (B * T1 * S, 728))
    s = _rand(28, (728,), jnp.float32) * 0.1 + 1.0
    b = _rand(29, (728,), jnp.float32) * 0.1
    w = _rand(30, (728, 1536)) * jnp.bfloat16(0.05)
    g = _rand(31, (B * T1 * S, 1536))
    dx, ds, db, dw = _ln_matmul_bwd_impl(x, s, b, w, g)
    _, vjp = jax.vjp(_ln_matmul_reference, x, s, b, w)
    dx_r, ds_r, db_r, dw_r = vjp(g)
    _assert_close_bf16(dx, dx_r)
    _assert_close_bf16(dw, dw_r)
    _assert_close_bf16(ds, ds_r)
    _assert_close_bf16(db, db_r)


@requires_tpu
def test_ln_ff_bwd_tpu():
    from istvt_tpu.kernels.mlp import _ln_ff_bwd_impl, _ln_ff_res_reference
    x = _rand(32, (B * T1 * S, 728))
    s = _rand(33, (728,), jnp.float32) * 0.1 + 1.0
    bn = _rand(34, (728,), jnp.float32) * 0.1
    w1 = _rand(35, (728, 2912)) * jnp.bfloat16(0.05)
    b1 = _rand(36, (2912,), jnp.float32) * 0.1
    w2 = _rand(37, (2912, 728)) * jnp.bfloat16(0.05)
    b2 = _rand(38, (728,), jnp.float32) * 0.1
    g = _rand(39, (B * T1 * S, 728))
    xn = ((x.astype(jnp.float32)
           - x.astype(jnp.float32).mean(-1, keepdims=True))
          * jax.lax.rsqrt(x.astype(jnp.float32).var(-1, keepdims=True)
                          + 1e-5) * s + bn).astype(x.dtype)
    h1 = (jnp.dot(xn, w1.astype(x.dtype),
                  preferred_element_type=jnp.float32)
          + b1).astype(x.dtype)
    outs = _ln_ff_bwd_impl(x, s, bn, w1.astype(x.dtype), h1,
                           w2.astype(x.dtype), g)
    _, vjp = jax.vjp(_ln_ff_res_reference, x, s, bn, w1, b1, w2, b2)
    refs = vjp(g)
    for got, want in zip(outs, refs):
        _assert_close_bf16(got, want, rel_l2=2e-2, max_frac=0.04)


@requires_tpu
def test_ln_matmul_q8_tpu():
    from istvt_tpu.kernels.quant import ln_matmul_q8, quantize_weight
    from istvt_tpu.kernels.linear import _ln_matmul_reference
    x = _rand(40, (B * T1 * S, 728))
    s = _rand(41, (728,), jnp.float32) * 0.1 + 1.0
    b = _rand(42, (728,), jnp.float32) * 0.1
    w = (_rand(43, (728, 1536), jnp.float32) * 0.05)
    wq, ws = quantize_weight(w)
    got = ln_matmul_q8(x, s, b, wq, ws)
    want = _ln_matmul_reference(x, s, b, w.astype(jnp.bfloat16))
    _assert_close_bf16(got, want, rel_l2=2e-2, max_frac=0.05)


@requires_tpu
def test_ln_ff_q8_full_tpu():
    from istvt_tpu.kernels.quant import (ln_ff_residual_q8_full,
                                         quantize_weight)
    from istvt_tpu.kernels.mlp import _ln_ff_res_reference
    x = _rand(44, (B * T1 * S, 728))
    s = _rand(45, (728,), jnp.float32) * 0.1 + 1.0
    bn = _rand(46, (728,), jnp.float32) * 0.1
    w1 = _rand(47, (728, 2912), jnp.float32) * 0.05
    b1 = _rand(48, (2912,), jnp.float32) * 0.1
    w2 = _rand(49, (2912, 728), jnp.float32) * 0.05
    b2 = _rand(50, (728,), jnp.float32) * 0.1
    w1q, w1s = quantize_weight(w1)
    w2q, w2s = quantize_weight(w2)
    got = ln_ff_residual_q8_full(x, s, bn, w1q, w1s, b1, w2q, w2s, b2)
    want = _ln_ff_res_reference(x, s, bn, w1.astype(jnp.bfloat16), b1,
                                w2.astype(jnp.bfloat16), b2)
    _assert_close_bf16(got, want, rel_l2=3e-2, max_frac=0.08)


@requires_tpu
def test_matmul_q8_bias_residual_tpu():
    from istvt_tpu.kernels.quant import (matmul_q8_bias_residual,
                                         quantize_weight)
    x = _rand(51, (B * T1 * S, INNER))
    w = _rand(52, (INNER, 728), jnp.float32) * 0.05
    b = _rand(53, (728,), jnp.float32) * 0.1
    r = _rand(54, (B * T1 * S, 728))
    wq, ws = quantize_weight(w)
    got = matmul_q8_bias_residual(x, wq, ws, b, r)
    want = (jnp.dot(x.astype(jnp.float32), w) + b
            + r.astype(jnp.float32)).astype(jnp.bfloat16)
    _assert_close_bf16(got, want, rel_l2=2e-2, max_frac=0.05)
