"""Interpretability tests: LRP rollout shapes/properties + heatmap render
(reconstructed `tfe` engine, SURVEY.md §2.7; overlay pipeline
visualize_rel.py:260-294)."""
import numpy as np

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.interpret import (
    bilinear_upsample,
    generate_feature_relevance,
    generate_lrp,
    jet,
    minmax,
    render_saliency,
    show_cam_on_image,
)
from istvt_tpu.models import istvt

TINY = ISTVTConfig(num_frames=3, image_size=72, feat_hw=5, depth=2)


def _setup():
    params, state = istvt.init(jax.random.PRNGKey(0), TINY)
    clips = jnp.asarray(np.random.RandomState(0).randn(
        2, TINY.num_frames, 72, 72, 3).astype(np.float32))
    return params, state, clips


def test_lrp_shapes_and_finiteness():
    params, state, clips = _setup()
    hw = TINY.feat_hw ** 2
    for method in ("transformer_attribution", "rollout", "last_layer"):
        cam_s, cam_t = generate_lrp(params, state, clips, TINY,
                                    method=method)
        assert cam_s.shape == (2, TINY.num_frames, hw)
        assert cam_t.shape == (2, TINY.num_frames, hw)
        assert bool(jnp.isfinite(cam_s).all())
        assert bool(jnp.isfinite(cam_t).all())
        # gradient-weighted rollout relevances are non-negative by
        # construction (relu of grad*attn, identity start)
        assert float(cam_s.min()) >= 0.0
        assert float(cam_t.min()) >= 0.0


def test_attn_bias_grad_path_nonzero():
    """The attribution must actually depend on gradients: the
    transformer_attribution maps must differ from the plain rollout."""
    params, state, clips = _setup()
    cam_s_a, _ = generate_lrp(params, state, clips, TINY,
                              method="transformer_attribution")
    cam_s_r, _ = generate_lrp(params, state, clips, TINY, method="rollout")
    assert not np.allclose(np.asarray(cam_s_a), np.asarray(cam_s_r))


def test_rollout_matches_numpy_reference():
    """The gradient-weighted rollout must equal an explicit numpy
    computation of the Chefer/tfe rule R = N(Ā_L + I)···N(Ā_1 + I) with
    Ā = E_h[(grad ⊙ A)+] and N row-normalizing (the relevance-conserving
    compute_rollout_attention; validated end-to-end against the torch
    harness in tests/test_lrp_golden.py)."""
    from istvt_tpu.interpret import lrp as L

    rng = np.random.RandomState(0)
    b, h, t1, s_tok = 1, 2, 3, 4
    attn = jnp.asarray(rng.rand(2, b, h, t1, s_tok, s_tok).astype(np.float32))
    grad = jnp.asarray(rng.randn(2, b, h, t1, s_tok, s_tok).astype(np.float32))
    abars = [L._head_agg(attn[i], grad[i]) for i in range(2)]
    r = np.asarray(L._rollout(abars))

    a_np = [np.mean(np.maximum(np.asarray(grad[i]) * np.asarray(attn[i]), 0),
                    axis=1) for i in range(2)]
    want = None
    for a in a_np:
        m = a + np.eye(s_tok, dtype=np.float32)
        m = m / m.sum(axis=-1, keepdims=True)
        want = m if want is None else \
            np.einsum("btij,btjk->btik", m, want)
    np.testing.assert_allclose(r, want, atol=1e-5, rtol=1e-5)
    # every row of the rollout is a relevance distribution (conservation)
    np.testing.assert_allclose(r.sum(-1), np.ones_like(r.sum(-1)),
                               atol=1e-5)


def test_attn_bias_grads_equal_attention_jacobian():
    """d logit / d attn_bias must equal the true gradient w.r.t. the
    post-softmax attention probabilities: verified against finite
    differences on one attention entry."""
    params, state, clips = _setup()
    attns, grads, logits = __import__(
        "istvt_tpu.interpret.lrp", fromlist=["attention_maps_and_grads"]
    ).attention_maps_and_grads(params, state, clips, TINY, index=0)

    t1 = TINY.num_frames + 1
    s_tok = TINY.tokens_per_frame
    # perturb one spatial-attention prob in layer 0 by eps via attn_bias
    eps = 1e-3
    bias = {
        "t": [jnp.zeros((2, TINY.heads, s_tok, t1, t1)) for _ in range(2)],
        "s": [jnp.zeros((2, TINY.heads, t1, s_tok, s_tok))
              for _ in range(2)],
    }
    bias["s"][0] = bias["s"][0].at[0, 0, 1, 2, 3].set(eps)
    from istvt_tpu.models import istvt
    (lp, _), _ = istvt.apply(params, state, clips, TINY, attn_bias=bias,
                             return_attn=True)
    (l0, _), _ = istvt.apply(params, state, clips, TINY, attn_bias=jax.
                             tree_util.tree_map(jnp.zeros_like, bias),
                             return_attn=True)
    fd = (float(lp[0, 0]) - float(l0[0, 0])) / eps
    analytic = float(grads["s"][0][0, 0, 1, 2, 3])
    assert abs(fd - analytic) < 5e-3 * max(abs(analytic), 1.0), \
        (fd, analytic)


def test_feature_relevance_shape():
    params, state, clips = _setup()
    rel = generate_feature_relevance(params, state, clips, TINY)
    assert rel.shape == (2, TINY.num_frames, 72, 72)
    assert bool(jnp.isfinite(rel).all())


def test_bilinear_upsample_matches_torch_interpolate():
    torch = __import__("pytest").importorskip("torch")
    m = np.random.RandomState(0).randn(5, 5).astype(np.float32)
    ours = bilinear_upsample(m, 16)
    theirs = torch.nn.functional.interpolate(
        torch.tensor(m)[None, None], scale_factor=16,
        mode="bilinear").numpy()[0, 0]
    assert ours.shape == theirs.shape == (80, 80)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_jet_endpoints_and_overlay():
    # JET endpoints: 0 -> dark blue, 1 -> dark red, 0.5 -> green-dominant
    c0 = jet(np.asarray(0.0))
    c1 = jet(np.asarray(1.0))
    ch = jet(np.asarray(0.5))
    assert c0[2] > 0.4 and c0[0] < 0.01 and c0[1] < 0.01
    assert c1[0] > 0.4 and c1[2] < 0.01 and c1[1] < 0.01
    assert ch[1] > 0.9 and ch[1] > ch[0] and ch[1] > ch[2]
    img = np.zeros((80, 80, 3), np.float32)
    mask = minmax(np.random.RandomState(0).rand(80, 80))
    out = show_cam_on_image(img, mask)
    assert out.dtype == np.uint8 and out.shape == (80, 80, 3)
    assert out.max() == 255  # renormalized by max


def test_render_saliency_geometry():
    cam = np.random.RandomState(0).rand(25)
    out = render_saliency(cam, frame=None, grid=5, scale=16)
    assert out.shape == (80, 80, 3)   # paper geometry: 19*16 = 304
