"""Pallas kernel parity vs the XLA einsum path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision
from istvt_tpu.kernels.attention import fused_frame_attention
from istvt_tpu.nn import attention as A
from istvt_tpu.nn.layers import linear_init


def test_fused_frame_attention_matches_einsum():
    rng = np.random.RandomState(0)
    g, s, dh = 6, 27, 16
    q, k, v = (jnp.asarray(rng.randn(g, s, dh).astype(np.float32))
               for _ in range(3))
    out = fused_frame_attention(q, k, v, interpret=True)

    with precision.highest():
        dots = jnp.einsum("gid,gjd->gij", q, k) * dh ** -0.5
        attn = jax.nn.softmax(dots, axis=-1)
        ref = jnp.einsum("gij,gjd->gid", attn, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_spatial_attention_pallas_path_matches_xla():
    rng = np.random.RandomState(1)
    b, t1, s, d, heads, inner = 2, 3, 26, 32, 4, 32
    key = jax.random.PRNGKey(0)
    p = {"to_qkv": linear_init(key, d, inner * 3, bias=False),
         "to_out": linear_init(key, inner, d)}
    x = jnp.asarray(rng.randn(b, t1 * s, d).astype(np.float32))
    with precision.highest():
        ref = A.spatial_only_attention(p, x, heads, s, use_pallas=False)
        out = A.spatial_only_attention(p, x, heads, s, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_temporal_attention_pallas_path_matches_xla():
    rng = np.random.RandomState(3)
    b, t1, s, d, heads, inner = 2, 4, 9, 16, 2, 16
    key = jax.random.PRNGKey(5)
    p = {"to_qk": linear_init(key, d, inner * 2, bias=False),
         "to_v": linear_init(jax.random.PRNGKey(6), d, inner, bias=False),
         "to_out": linear_init(jax.random.PRNGKey(7), inner, d)}
    x = jnp.asarray(rng.randn(b, t1 * s, d).astype(np.float32))
    with precision.highest():
        ref = A.temporal_residual_attention(p, x, heads, s, use_pallas=False)
        out = A.temporal_residual_attention(p, x, heads, s, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_gradients_match_xla():
    """custom_vjp backward (XLA recompute) must match grads of the plain
    XLA attention path."""
    rng = np.random.RandomState(4)
    b, t1, s, d, heads, inner = 2, 3, 10, 16, 2, 16
    key = jax.random.PRNGKey(8)
    p_s = {"to_qkv": linear_init(key, d, inner * 3, bias=False),
           "to_out": linear_init(jax.random.PRNGKey(9), inner, d)}
    p_t = {"to_qk": linear_init(jax.random.PRNGKey(10), d, inner * 2,
                                bias=False),
           "to_v": linear_init(jax.random.PRNGKey(11), d, inner,
                               bias=False),
           "to_out": linear_init(jax.random.PRNGKey(12), inner, d)}
    x = jnp.asarray(rng.randn(b, t1 * s, d).astype(np.float32))

    # gradient w.r.t. x through both paths
    def loss(xx, pal, which):
        if which == "s":
            return jnp.sum(A.spatial_only_attention(
                p_s, xx, heads, s, use_pallas=pal) ** 2)
        return jnp.sum(A.temporal_residual_attention(
            p_t, xx, heads, s, use_pallas=pal) ** 2)

    with precision.highest():
        for which in ("s", "t"):
            g0 = jax.grad(loss)(x, False, which)
            g1 = jax.grad(loss)(x, True, which)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       atol=2e-4, rtol=2e-4)


def test_fused_frame_attention_bwd_matches_vjp():
    """The flash-style backward kernel must match jax.vjp of the
    reference attention (interpret mode)."""
    from istvt_tpu.kernels.attention import fused_frame_attention_bwd
    rng = np.random.RandomState(7)
    g, s, h, dh = 3, 26, 2, 16
    q, k, v, do = (jnp.asarray(rng.randn(g, s, h * dh).astype(np.float32))
                   for _ in range(4))

    def ref(q, k, v):
        qh = q.reshape(g, s, h, dh)
        kh = k.reshape(g, s, h, dh)
        vh = v.reshape(g, s, h, dh)
        dots = jnp.einsum("gihd,gjhd->ghij", qh, kh) * dh ** -0.5
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("ghij,gjhd->gihd", attn, vh)
        return out.reshape(g, s, h * dh)

    with precision.highest():
        _, vjp = jax.vjp(ref, q, k, v)
        want_dq, want_dk, want_dv = vjp(do)
        dq, dk, dv = fused_frame_attention_bwd(q, k, v, do, heads=h,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                               atol=2e-4, rtol=2e-4)


def test_fused_temporal_attention_bwd_matches_vjp():
    """Temporal backward kernel (incl. transposed self-subtract) vs
    jax.vjp of the XLA reference (interpret mode)."""
    from istvt_tpu.kernels.attention import (_temporal_reference,
                                             fused_temporal_attention_bwd)
    rng = np.random.RandomState(8)
    b, t1, s, h, dh = 2, 4, 9, 2, 16
    q, k, v, do = (jnp.asarray(
        rng.randn(b, t1, s, h * dh).astype(np.float32)) for _ in range(4))
    with precision.highest():
        _, vjp = jax.vjp(lambda a, bb, c: _temporal_reference(a, bb, c, h),
                         q, k, v)
        want_dq, want_dk, want_dv = vjp(do)
        dq, dk, dv = fused_temporal_attention_bwd(q, k, v, do, heads=h,
                                                  interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                               atol=2e-4, rtol=2e-4)


def test_fused_ff_matches_reference():
    """Fused fc1+gelu+fc2 kernel vs XLA reference. Tolerance covers the
    in-kernel tanh-approx GELU (exact erf doesn't lower in Pallas)."""
    from istvt_tpu.kernels.mlp import _ff_reference, fused_ff
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 70, 32), jnp.float32)
    w1 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (32, 128))
    b1 = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (128,))
    w2 = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (128, 32))
    b2 = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (32,))
    ref = _ff_reference(x.reshape(-1, 32), w1, b1, w2, b2).reshape(x.shape)
    out = fused_ff(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
    # gradients flow through the custom_vjp recompute path
    g = jax.grad(lambda xx: float(0) + jnp.sum(
        fused_ff(xx, w1, b1, w2, b2) ** 2))(x)
    g_ref = jax.grad(lambda xx: jnp.sum(
        _ff_reference(xx.reshape(-1, 32), w1, b1, w2, b2) ** 2))(
            x.reshape(-1, 32)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-2)


def test_temporal_fused_projection_equivalence():
    """The fused single-GEMM + subtract-after-projection formulation must
    equal projecting the subtracted stream (linearity; module.py:193)."""
    rng = np.random.RandomState(2)
    b, t1, s, d, heads, inner = 2, 4, 9, 16, 2, 16
    key = jax.random.PRNGKey(1)
    p = {"to_qk": linear_init(key, d, inner * 2, bias=False),
         "to_v": linear_init(jax.random.PRNGKey(2), d, inner, bias=False),
         "to_out": linear_init(jax.random.PRNGKey(3), inner, d)}
    x = jnp.asarray(rng.randn(b, t1 * s, d).astype(np.float32))

    with precision.highest():
        out = A.temporal_residual_attention(p, x, heads, s)

        # reference formulation: project the subtracted stream directly
        from istvt_tpu.nn.layers import linear
        x_t = x.reshape(b, t1, s, d)
        residual = A.self_subtract(x_t).reshape(b, t1 * s, d)
        qk = linear(p["to_qk"], residual)
        q, k = jnp.split(qk, 2, axis=-1)
        v = linear(p["to_v"], x)
        q = q.reshape(b, t1, s, heads, -1)
        k = k.reshape(b, t1, s, heads, -1)
        v = v.reshape(b, t1, s, heads, -1)
        dots = jnp.einsum("bishd,bjshd->bshij", q, k) * q.shape[-1] ** -0.5
        attn = jax.nn.softmax(dots, axis=-1)
        ref = jnp.einsum("bshij,bjshd->bishd", attn, v).reshape(b, t1 * s, -1)
        ref = linear(p["to_out"], ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ln_matmul_matches_reference():
    from istvt_tpu.kernels.linear import _ln_matmul_reference, ln_matmul
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 70, 24).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.randn(24).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(24).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(24, 48).astype(np.float32))
    with precision.highest():
        ref = _ln_matmul_reference(x.reshape(-1, 24), s, b, w).reshape(
            2, 70, 48)
        out = ln_matmul(x, s, b, w)
        g = jax.grad(lambda xx: jnp.sum(ln_matmul(xx, s, b, w) ** 2))(x)
        g_ref = jax.grad(lambda xx: jnp.sum(_ln_matmul_reference(
            xx.reshape(-1, 24), s, b, w) ** 2))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-4)


def test_matmul_bias_residual_matches_reference():
    from istvt_tpu.kernels.linear import (_matmul_bias_reference,
                                          matmul_bias_residual)
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 70, 16).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(16, 24).astype(np.float32))
    b = jnp.asarray(0.1 * rng.randn(24).astype(np.float32))
    r = jnp.asarray(rng.randn(2, 70, 24).astype(np.float32))
    with precision.highest():
        ref = _matmul_bias_reference(x.reshape(-1, 16), w, b,
                                     r.reshape(-1, 24)).reshape(2, 70, 24)
        out = matmul_bias_residual(x, w, b, r)
        out_nores = matmul_bias_residual(x, w, b, None)
        ref_nores = _matmul_bias_reference(x.reshape(-1, 16), w, b,
                                           None).reshape(2, 70, 24)
        gx, gr = jax.grad(lambda xx, rr: jnp.sum(
            matmul_bias_residual(xx, w, b, rr) ** 2), argnums=(0, 1))(x, r)
        gx_ref, gr_ref = jax.grad(lambda xx, rr: jnp.sum(
            _matmul_bias_reference(xx.reshape(-1, 16), w, b,
                                   rr.reshape(-1, 24)) ** 2),
            argnums=(0, 1))(x, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_nores), np.asarray(ref_nores),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               atol=2e-4, rtol=2e-4)


def test_ln_ff_residual_matches_reference():
    from istvt_tpu.kernels.mlp import _ln_ff_res_reference, ln_ff_residual
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(2, 70, 32).astype(np.float32))
    s = jnp.asarray(1.0 + 0.1 * rng.randn(32).astype(np.float32))
    bn = jnp.asarray(0.1 * rng.randn(32).astype(np.float32))
    w1 = jnp.asarray(0.1 * rng.randn(32, 128).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.randn(128).astype(np.float32))
    w2 = jnp.asarray(0.1 * rng.randn(128, 32).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.randn(32).astype(np.float32))
    with precision.highest():
        ref = _ln_ff_res_reference(x.reshape(-1, 32), s, bn, w1, b1,
                                   w2, b2).reshape(x.shape)
        out = ln_ff_residual(x, s, bn, w1, b1, w2, b2)
        g = jax.grad(lambda xx: jnp.sum(
            ln_ff_residual(xx, s, bn, w1, b1, w2, b2) ** 2))(x)
        g_ref = jax.grad(lambda xx: jnp.sum(_ln_ff_res_reference(
            xx.reshape(-1, 32), s, bn, w1, b1, w2, b2) ** 2))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_layer_path_matches_unfused_istvt():
    """The fully fused ST layer (use_pallas=True interpret) must match the
    plain XLA path end-to-end on a tiny ISTVT, fwd and grads."""
    from istvt_tpu.core.config import ISTVTConfig
    from istvt_tpu.models import istvt

    cfg_x = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=2,
                        dropout=0.0, use_pallas=False)
    cfg_p = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=2,
                        dropout=0.0, use_pallas=True)
    params, state = istvt.init(jax.random.PRNGKey(0), cfg_x)
    clips = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 72, 72, 3))
    with precision.highest():
        ref, _ = istvt.apply(params, state, clips, cfg_x, train=False)
        out, _ = istvt.apply(params, state, clips, cfg_p, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=5e-4)

        def loss(p, cfg):
            lg, _ = istvt.apply(p, state, clips, cfg, train=False)
            return jnp.sum(lg ** 2)

        g_ref = jax.grad(loss)(params, cfg_x)
        g_out = jax.grad(loss)(params, cfg_p)
    leaves_r, _ = jax.tree_util.tree_flatten(g_ref)
    leaves_o, _ = jax.tree_util.tree_flatten(g_out)
    for lr, lo in zip(leaves_r, leaves_o):
        np.testing.assert_allclose(np.asarray(lo), np.asarray(lr),
                                   atol=5e-3, rtol=5e-3)


def test_ln_matmul_bwd_kernel_matches_vjp():
    """Fused LN->GEMM backward (interpret mode) vs jax.vjp of the XLA
    reference."""
    from istvt_tpu.kernels.linear import (
        _ln_matmul_bwd_impl, _ln_matmul_reference)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(40, 128).astype(np.float32))
    s = jnp.asarray(rng.rand(128).astype(np.float32) * 0.2 + 0.9)
    b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.randn(40, 256).astype(np.float32))

    dx, ds, db, dw = _ln_matmul_bwd_impl(x, s, b, w, g, interpret=True)
    _, vjp = jax.vjp(_ln_matmul_reference, x, s, b, w)
    dx_r, ds_r, db_r, dw_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_r),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                               atol=2e-4, rtol=2e-4)


def test_ln_ff_bwd_kernel_matches_vjp():
    """Fused PreNorm-FF backward (interpret mode) vs jax.vjp of the XLA
    reference. Multi-tile rows exercise the grid accumulation."""
    from istvt_tpu.kernels.mlp import _ln_ff_bwd_impl, _ln_ff_res_reference

    rng = np.random.RandomState(1)
    n, d, h = 48, 64, 256  # n = 2 tiles of 24? _row_tiles picks 48 -> 1;
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    s = jnp.asarray(rng.rand(d).astype(np.float32) * 0.2 + 0.9)
    bn = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(n, d).astype(np.float32))

    # forward stash: h1 = fc1(LN(x)) + b1 (what the fwd kernel writes)
    xn = (x - x.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        x.var(-1, keepdims=True) + 1e-5) * s + bn
    h1 = jnp.dot(xn, w1) + b1
    dx, ds, dbn, dw1, db1, dw2, db2 = _ln_ff_bwd_impl(
        x, s, bn, w1, h1, w2, g, interpret=True)
    _, vjp = jax.vjp(_ln_ff_res_reference, x, s, bn, w1, b1, w2, b2)
    refs = vjp(g)
    for got, want in zip((dx, ds, dbn, dw1, db1, dw2, db2), refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4)


def test_ln_matmul_bwd_grid_accumulation():
    """Rows spanning several grid tiles (including a padded tail) must
    accumulate dw/ds/db exactly like the single-shot reference."""
    from istvt_tpu.kernels.linear import (
        _ln_matmul_bwd_impl, _ln_matmul_reference)

    rng = np.random.RandomState(2)
    n, d, k = 1040, 128, 128   # 1040 = 130 x 8: tiles of 520/etc + pad
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    s = jnp.asarray(rng.rand(d).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(d, k).astype(np.float32) * 0.05)
    g = jnp.asarray(rng.randn(n, k).astype(np.float32))
    dx, ds, db, dw = _ln_matmul_bwd_impl(x, s, b, w, g, interpret=True)
    _, vjp = jax.vjp(_ln_matmul_reference, x, s, b, w)
    dx_r, ds_r, db_r, dw_r = vjp(g)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               atol=5e-4, rtol=5e-4)


def test_temporal_packed_bwd_kernel_matches_vjp():
    """Packed (segmented-matmul) temporal-attention backward vs jax.vjp
    of the XLA reference (interpret mode)."""
    from istvt_tpu.kernels.attention import (
        _temporal_packed_reference, fused_temporal_attention_packed_bwd)

    rng = np.random.RandomState(0)
    b, t1, s, heads, dh = 2, 4, 16, 2, 8
    inner = heads * dh
    qkv = jnp.asarray(rng.randn(b, t1, s, 3 * inner).astype(np.float32))
    g = jnp.asarray(rng.randn(b, t1, s, inner).astype(np.float32))
    got = fused_temporal_attention_packed_bwd(qkv, g, heads=heads,
                                              interpret=True)
    _, vjp = jax.vjp(lambda u: _temporal_packed_reference(u, heads), qkv)
    (want,) = vjp(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sepconv_bn_kernel_matches_reference():
    """Fused [relu->]sepconv->foldedBN kernel (interpret) vs the XLA
    separable_conv2d + inference batchnorm composition."""
    from istvt_tpu.kernels.conv import _sepconv_bn_reference, sepconv_bn
    from istvt_tpu.nn.layers import batchnorm, separable_conv2d

    rng = np.random.RandomState(0)
    n, h, w, cin, cout = 2, 13, 11, 16, 24
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    dw = jnp.asarray(rng.randn(3, 3, 1, cin).astype(np.float32) * 0.2)
    pw = jnp.asarray(rng.randn(1, 1, cin, cout).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.05)
    var = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)

    from istvt_tpu.kernels.conv import fold_bn
    a, b = fold_bn(scale, bias, mean, var)
    for relu_in in (False, True):
        got = sepconv_bn(x, dw.reshape(9, cin), pw.reshape(cin, cout),
                         a.reshape(1, -1), b.reshape(1, -1), relu_in)
        # golden: the actual layer composition used on the XLA path
        xi = jnp.maximum(x, 0) if relu_in else x
        y = separable_conv2d({"dw": {"w": dw}, "pw": {"w": pw}}, xi,
                             stride=1, padding=1)
        want, _ = batchnorm({"scale": scale, "bias": bias},
                            {"mean": mean, "var": var}, y, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4)


def test_sepconv_bn_vs_xception_unit():
    """The fused sepconv kernel (kernels/conv.py — unwired negative
    result, see models/xception.block_apply docstring) must still match
    a real Xception block unit's sepconv+BN composition exactly."""
    from istvt_tpu.kernels.conv import fold_bn, sepconv_bn
    from istvt_tpu.models import xception as X
    from istvt_tpu.nn.layers import batchnorm, relu, separable_conv2d

    p, s = X.block_init(jax.random.PRNGKey(0), X.BLOCK_SPECS[0])
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 24, 24, 64).astype(np.float32) * 0.5)
    unit, bns = p["rep"][0], s["rep"][0]["bn"]
    a, b = fold_bn(unit["bn"]["scale"], unit["bn"]["bias"],
                   bns["mean"], bns["var"])
    got = sepconv_bn(x, unit["sep"]["dw"]["w"].reshape(9, 64),
                     unit["sep"]["pw"]["w"].reshape(64, -1),
                     a.reshape(1, -1), b.reshape(1, -1), False)
    y = separable_conv2d(unit["sep"], x, stride=1, padding=1)
    want, _ = batchnorm(unit["bn"], bns, y, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_sepconv_bn_gradient():
    """custom_vjp backward (XLA recompute) supports eval-mode grads
    (the LRP input-relevance path)."""
    from istvt_tpu.kernels.conv import (_sepconv_bn_reference, fold_bn,
                                        sepconv_bn)

    rng = np.random.RandomState(2)
    n, h, w, cin, cout = 1, 8, 8, 8, 8
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
    dw = jnp.asarray(rng.randn(9, cin).astype(np.float32) * 0.2)
    pw = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.2)
    a = jnp.ones((1, cout), jnp.float32)
    b = jnp.zeros((1, cout), jnp.float32)
    g_ker = jax.grad(lambda u: jnp.sum(sepconv_bn(u, dw, pw, a, b, True)
                                       ** 2))(x)
    g_ref = jax.grad(lambda u: jnp.sum(
        _sepconv_bn_reference(u, dw, pw, a, b, True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_ln_ff_h1_forward_matches():
    """The h1-stashing training forward equals the plain fused forward
    and its stash equals fc1(LN(x)) + b1."""
    from istvt_tpu.kernels.mlp import (_ln_ff_res_h1_impl,
                                       _ln_ff_res_reference)

    rng = np.random.RandomState(4)
    n, d, h = 40, 64, 128
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    s = jnp.asarray(rng.rand(d).astype(np.float32) + 0.5)
    bn = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    out, h1 = _ln_ff_res_h1_impl(x, s, bn, w1, b1, w2, b2,
                                 interpret=True)
    want = _ln_ff_res_reference(x, s, bn, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    xn = (x - x.mean(-1, keepdims=True)) * jax.lax.rsqrt(
        x.var(-1, keepdims=True) + 1e-5) * s + bn
    np.testing.assert_allclose(np.asarray(h1),
                               np.asarray(jnp.dot(xn, w1) + b1),
                               atol=2e-4, rtol=2e-4)


def test_ln_ff_residual_grad_end_to_end():
    """jax.grad through the public ln_ff_residual custom_vjp (CPU path)
    matches the reference — the vjp rewiring must stay differentiable."""
    from istvt_tpu.kernels.mlp import ln_ff_residual, _ln_ff_res_reference

    rng = np.random.RandomState(5)
    n, d, h = 24, 32, 64
    args = [jnp.asarray(a.astype(np.float32)) for a in (
        rng.randn(n, d), rng.rand(d) + 0.5, rng.randn(d) * 0.1,
        rng.randn(d, h) * 0.1, rng.randn(h) * 0.1,
        rng.randn(h, d) * 0.1, rng.randn(d) * 0.1)]
    g_ker = jax.grad(lambda *a: jnp.sum(ln_ff_residual(*a) ** 2),
                     argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(lambda *a: jnp.sum(_ln_ff_res_reference(*a) ** 2),
                     argnums=tuple(range(7)))(*args)
    for a, b in zip(g_ker, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_head_pair_path_bitwise_matches_per_head(monkeypatch):
    """dh=64 engages the aligned head-PAIR path (attention._pair_heads):
    128-lane slices with the other head's K/V lanes zero-masked must be
    BITWISE equal to the per-head fallback — zeros kill cross-head score
    terms exactly and the pair PV sums concatenate head outputs."""
    from istvt_tpu.kernels import attention as K

    rng = np.random.RandomState(11)
    g, s, heads, dh = 3, 24, 4, 64
    inner = heads * dh
    qkv = jnp.asarray(rng.randn(g, s, 3 * inner).astype(np.float32))
    assert K._pair_heads(heads, dh, inner)
    out_pair = K.fused_frame_attention_packed(qkv, heads, n_valid=s - 3,
                                              interpret=True)
    monkeypatch.setattr(K, "_pair_heads", lambda *a: False)
    out_head = K.fused_frame_attention_packed.__wrapped__(
        qkv, heads, n_valid=s - 3, interpret=True)
    assert np.array_equal(np.asarray(out_pair), np.asarray(out_head))


def test_head_pair_bwd_matches_vjp_dh64():
    """Flash bwd pair path (dh=64) vs jax.vjp of the reference chain."""
    from istvt_tpu.kernels.attention import fused_frame_attention_bwd

    rng = np.random.RandomState(12)
    g, s, heads, dh = 2, 16, 2, 64
    hd = heads * dh
    q, k, v, do = (jnp.asarray(rng.randn(g, s, hd).astype(np.float32))
                   for _ in range(4))

    def ref(q, k, v):
        qh = q.reshape(g, s, heads, dh)
        kh = k.reshape(g, s, heads, dh)
        vh = v.reshape(g, s, heads, dh)
        with precision.highest():
            dots = jnp.einsum("gihd,gjhd->ghij", qh, kh) * dh ** -0.5
            pr = jax.nn.softmax(dots, axis=-1)
            o = jnp.einsum("ghij,gjhd->gihd", pr, vh)
        return o.reshape(g, s, hd)

    _, vjp = jax.vjp(ref, q, k, v)
    want = vjp(do)
    got = fused_frame_attention_bwd(q, k, v, do, heads=heads,
                                    interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)
