"""Xception backbone (TPU-native re-implementation).

Architecture parity with the reference's three near-identical copies
(reference network/xception.py:104-220, network/xception_for_dualnet.py,
network/vivit/xception.py) — collapsed into ONE parameterized model with
stage-sliced accessors:

  * ``features``            conv1..conv4/bn4          (xception.py:161-191)
  * ``low_level_features``  conv1..block3 -> 19x19x728 (xception.py:193-206)
                            — the ISTVT stem
  * ``mid_features(k)``     conv1..block{k} — generalizes the DualNet stage
                            slices fea_0_7/fea_8_12 (xception_for_dualnet.py:215-284)
  * ``logits``              relu -> GAP -> fc          (xception.py:208-215)

Activations are NHWC. Entry flow on 300x300: 300 ->conv1 s2 p0-> 149
->conv2 k3 p0-> 147 ->block1 s2-> 74 ->block2 s2-> 37 ->block3 s2-> 19.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from istvt_tpu.core import precision as _precision

from istvt_tpu.nn.layers import (
    batchnorm,
    batchnorm_init,
    conv2d,
    conv2d_init,
    global_avg_pool,
    linear,
    linear_init,
    max_pool2d,
    relu,
    separable_conv2d,
    separable_conv2d_init,
)

# (in, out, reps, stride, start_with_relu, grow_first) per block,
# mirroring reference network/xception.py:126-140.
BLOCK_SPECS: Tuple[Tuple[int, int, int, int, bool, bool], ...] = (
    (64, 128, 2, 2, False, True),
    (128, 256, 2, 2, True, True),
    (256, 728, 2, 2, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 728, 3, 1, True, True),
    (728, 1024, 2, 2, True, False),
)


@dataclasses.dataclass(frozen=True)
class XceptionConfig:
    num_classes: int = 1000
    in_channels: int = 3          # 15 for the frame-stack 'xception_concat'
                                  # variant (reference xception.py:224-343)
    low_level_through: int = 3    # low_level_features runs blocks 1..k;
                                  # 3 for ISTVT, 9 for Xception_concat (:311-330)


def _block_filters(spec):
    """Channel sizes of the sepconv sequence inside a block."""
    in_f, out_f, reps, _, _, _ = spec
    sizes = []
    if spec[5]:  # grow_first
        sizes.append((in_f, out_f))
        sizes += [(out_f, out_f)] * (reps - 1)
    else:
        sizes += [(in_f, in_f)] * (reps - 1)
        sizes.append((in_f, out_f))
    return sizes


def block_init(key, spec):
    in_f, out_f, reps, stride, _, _ = spec
    keys = jax.random.split(key, reps + 1)
    p, s = {"rep": []}, {"rep": []}
    for i, (ci, co) in enumerate(_block_filters(spec)):
        bp, bs = batchnorm_init(co)
        p["rep"].append({"sep": separable_conv2d_init(keys[i], ci, co), "bn": bp})
        s["rep"].append({"bn": bs})
    if out_f != in_f or stride != 1:
        p["skip"] = conv2d_init(keys[-1], in_f, out_f, 1)
        p["skipbn"], sk = batchnorm_init(out_f)
        s["skipbn"] = sk
    return p, s


def block_apply(p, s, x, spec, train: bool, use_pallas: bool = False,
                store_dtype=None, compute_dtype=None):
    """Residual sepconv block (reference network/xception.py:52-101).

    use_pallas is accepted for signature stability but the XLA path is
    always used: a fused [relu->]sepconv->foldedBN Pallas kernel exists
    (kernels/conv.py) and is numerically exact, but measured SLOWER than
    XLA's lowering on v5e (74^2: 5.7 vs 4.2 ms; 37^2: 6.8 vs 5.8; the
    147^2 shape exceeds the remote compiler) — Mosaic's sublane-shifted
    depthwise taps cost more than XLA's conv schedule. Kept unwired as a
    documented negative result.

    store_dtype (serving-only): when set (f8_e4m3), inter-conv
    activations are STORED in that dtype — XLA fuses the converts into
    the conv input/output fusions, halving the stem's HBM traffic (the
    stem is ~100% bandwidth-bound; measured 14.5 -> 12.5 ms/96-frames).
    Compute stays in x.dtype; the ~6% elementwise feature error (3-bit
    mantissa) is gated by the int8 accuracy tests (tests/test_quant.py).
    """
    _, _, _, stride, start_with_relu, _ = spec
    cd = x.dtype if store_dtype is None else (compute_dtype or jnp.bfloat16)
    up = lambda v: v if v.dtype == cd else v.astype(cd)
    cast = (lambda v: v.astype(store_dtype)) if store_dtype is not None \
        else (lambda v: v)
    y = x
    ns = {"rep": []}
    if store_dtype is not None:
        # Serving-only compressed-storage path. Two fusion-shaping moves
        # (profiled: a bare f8 cast after conv->BN SPLITS the conv output
        # fusion, adding a bf16 materialization + a separate BN+convert
        # pass — ~12 ms/batch32 of 'add_convert_fusion'):
        #  * eval-BN folds into the pointwise/skip conv weights (w*A,
        #    bias B), so the conv epilogue is just bias + f8 convert;
        #  * each unit's FOLLOWING pre-sepconv relu runs in the producing
        #    epilogue instead of as a read-modify-write pass.
        # MEASURED NEGATIVE (r4, keep off): 1x1 convs as explicit GEMMs
        # (reshape -> dot -> reshape) are 5x SLOWER than the conv form
        # (112.5 vs 22.1 ms/batch32 stem, interleaved A/B) — collapsing
        # (N,H,W) into the dot's M dimension forces physical relayouts
        # of every 531 MB 147^2 tensor, dwarfing any epilogue-fusion win.
        # XLA's conv lowering is already layout-optimal here; the
        # hypothesis that its batch-minor conv1/conv2 layouts cost
        # relayout passes was wrong (docs/KERNELS.md r4 entry).
        pw_gemm = os.environ.get("ISTVT_STEM_PW_GEMM", "0") == "1"

        def pointwise(f, v, stride_=1):
            if not pw_gemm:
                return conv2d(f, v, stride=stride_, padding=0)
            if stride_ != 1:
                v = v[:, ::stride_, ::stride_, :]
            n, h, w, c = v.shape
            z = jnp.dot(v.reshape(n * h * w, c), f["w"].reshape(c, -1),
                        precision=_precision.get()) + f["b"]
            return z.reshape(n, h, w, -1)

        reps = len(p["rep"])
        for i, unit in enumerate(p["rep"]):
            if i == 0 and start_with_relu:
                y = relu(up(y))
            c = up(y).shape[-1]
            y = cast(conv2d(unit["sep"]["dw"], up(y), stride=1,
                            padding=1, groups=c))
            a, bb = _bn_affine(unit["bn"], s["rep"][i]["bn"])
            pw_f = {"w": (unit["sep"]["pw"]["w"].astype(jnp.float32)
                          * a).astype(cd),
                    "b": bb.astype(cd)}
            z = pointwise(pw_f, up(y))
            if i + 1 < reps:
                z = relu(z)   # the next unit's pre-relu, fused here
            y = cast(z)
            ns["rep"].append({"bn": s["rep"][i]["bn"]})
        y = up(y)
        if stride != 1:
            y = max_pool2d(y, 3, stride, 1)
        if "skip" in p:
            a, bb = _bn_affine(p["skipbn"], s["skipbn"])
            sk_f = {"w": (p["skip"]["w"].astype(jnp.float32)
                          * a).astype(cd),
                    "b": bb.astype(cd)}
            skip = pointwise(sk_f, up(x), stride_=stride)
            ns["skipbn"] = s["skipbn"]
        else:
            skip = up(x)
        return cast(y + skip), ns
    for i, unit in enumerate(p["rep"]):
        if i > 0 or start_with_relu:
            y = relu(y)
        y = separable_conv2d(unit["sep"], y, stride=1, padding=1)
        y, bs = batchnorm(unit["bn"], s["rep"][i]["bn"], y, train)
        ns["rep"].append({"bn": bs})
    if stride != 1:
        y = max_pool2d(y, 3, stride, 1)
    if "skip" in p:
        skip = conv2d(p["skip"], x, stride=stride, padding=0)
        skip, sk = batchnorm(p["skipbn"], s["skipbn"], skip, train)
        ns["skipbn"] = sk
    else:
        skip = x
    return y + skip, ns


def init(key, cfg: XceptionConfig = XceptionConfig()):
    keys = jax.random.split(key, 20)
    p, s = {}, {}
    p["conv1"] = conv2d_init(keys[0], cfg.in_channels, 32, 3)
    p["bn1"], s["bn1"] = batchnorm_init(32)
    p["conv2"] = conv2d_init(keys[1], 32, 64, 3)
    p["bn2"], s["bn2"] = batchnorm_init(64)
    for i, spec in enumerate(BLOCK_SPECS):
        bp, bs = block_init(keys[2 + i], spec)
        p[f"block{i + 1}"], s[f"block{i + 1}"] = bp, bs
    p["conv3"] = separable_conv2d_init(keys[14], 1024, 1536)
    p["bn3"], s["bn3"] = batchnorm_init(1536)
    p["conv4"] = separable_conv2d_init(keys[15], 1536, 2048)
    p["bn4"], s["bn4"] = batchnorm_init(2048)
    p["fc"] = linear_init(keys[16], 2048, cfg.num_classes)
    return p, s


def _bn_affine(bn_p, bn_s, eps: float = 1e-5):
    """Eval-mode BN as (A, B) f32 with y = x*A + B — folds into the
    preceding conv's weights on the serving path (numerics: the same
    affine, applied associatively to the weights)."""
    inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + eps)
    a = bn_p["scale"].astype(jnp.float32) * inv
    b = bn_p["bias"].astype(jnp.float32) \
        - bn_s["mean"].astype(jnp.float32) * a
    return a, b


def _entry(p, s, x, train, store_dtype=None):
    cd = x.dtype
    up = lambda v: v if v.dtype == cd else v.astype(cd)
    ns = {}
    if store_dtype is not None:
        a, bb = _bn_affine(p["bn1"], s["bn1"])
        c1 = {"w": (p["conv1"]["w"].astype(jnp.float32) * a).astype(cd),
              "b": bb.astype(cd)}
        x = relu(conv2d(c1, x, stride=2, padding=0)).astype(store_dtype)
        a, bb = _bn_affine(p["bn2"], s["bn2"])
        c2 = {"w": (p["conv2"]["w"].astype(jnp.float32) * a).astype(cd),
              "b": bb.astype(cd)}
        x = relu(conv2d(c2, up(x), stride=1,
                        padding=0)).astype(store_dtype)
        return x, {"bn1": s["bn1"], "bn2": s["bn2"]}
    x = conv2d(p["conv1"], x, stride=2, padding=0)
    x, ns["bn1"] = batchnorm(p["bn1"], s["bn1"], x, train)
    x = relu(x)
    x = conv2d(p["conv2"], x, stride=1, padding=0)
    x, ns["bn2"] = batchnorm(p["bn2"], s["bn2"], x, train)
    x = relu(x)
    return x, ns


def mid_features(p, s, x, through_block: int, train: bool = False,
                 use_pallas: bool = False, store_dtype=None):
    """conv1..block{through_block}. through=3 is the ISTVT stem
    (reference network/xception.py:193-206).

    State for stages NOT run passes through unchanged so the returned
    state tree always matches the init tree (stable checkpoints/pjit).

    store_dtype: optional compressed storage dtype for the inter-conv
    activations (see block_apply); the returned features are always in
    the input compute dtype."""
    cd = x.dtype
    ns = dict(s)
    x, ent = _entry(p, s, x, train, store_dtype=store_dtype)
    ns.update(ent)
    for i in range(1, through_block + 1):
        name = f"block{i}"
        x, ns[name] = block_apply(p[name], s[name], x, BLOCK_SPECS[i - 1],
                                  train, use_pallas=use_pallas,
                                  store_dtype=store_dtype,
                                  compute_dtype=cd)
    if x.dtype != cd:
        x = x.astype(cd)
    return x, ns


def low_level_features(p, s, x, train: bool = False,
                       cfg: XceptionConfig = XceptionConfig(),
                       use_pallas: bool = False, store_dtype=None):
    return mid_features(p, s, x, cfg.low_level_through, train,
                        use_pallas=use_pallas, store_dtype=store_dtype)


def tail_features(p, s, x, from_block: int = 8, train: bool = False):
    """block{from_block}..block12 -> conv3/conv4 -> (B, h, w, 2048): the
    DualNet late stage `fea_8_12` (reference xception_for_dualnet.py:233-247).
    Untouched stage state passes through unchanged."""
    ns = dict(s)
    for i in range(from_block, 13):
        name = f"block{i}"
        x, ns[name] = block_apply(p[name], s[name], x, BLOCK_SPECS[i - 1],
                                  train)
    x = separable_conv2d(p["conv3"], x, stride=1, padding=1)
    x, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], x, train)
    x = relu(x)
    x = separable_conv2d(p["conv4"], x, stride=1, padding=1)
    x, ns["bn4"] = batchnorm(p["bn4"], s["bn4"], x, train)
    return x, ns


def features(p, s, x, train: bool = False):
    """Full feature extractor conv1..bn4 (reference xception.py:161-191)."""
    x, ns = mid_features(p, s, x, 12, train)
    x = separable_conv2d(p["conv3"], x, stride=1, padding=1)
    x, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], x, train)
    x = relu(x)
    x = separable_conv2d(p["conv4"], x, stride=1, padding=1)
    x, ns["bn4"] = batchnorm(p["bn4"], s["bn4"], x, train)
    return x, ns


def logits(p, x):
    """relu -> GAP -> fc (reference xception.py:208-215)."""
    x = relu(x)
    x = global_avg_pool(x)
    return linear(p["fc"], x)


def forward(p, s, x, train: bool = False):
    f, ns = features(p, s, x, train)
    return logits(p, f), ns


# ---------------------------------------------------------------------------
# ClassBlock — deep MLP head over 2048-d features
# (reference network/xception_for_dualnet.py:104-137)


def class_block_init(key, in_dim: int = 2048):
    keys = jax.random.split(key, 4)
    return {
        "c0": linear_init(keys[0], in_dim, 1024),
        "c1": linear_init(keys[1], 1024, 512),
        "c2": linear_init(keys[2], 512, 512),
        "c3": linear_init(keys[3], 512, 1),
    }


def class_block_apply(p, x, train: bool = False, rng=None,
                      drop: float = 0.5):
    """Dropout -> Linear -> LeakyReLU(0.1) x3 -> Linear(512, 1)."""
    from istvt_tpu.nn.layers import dropout

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.1 * v)

    keys = jax.random.split(rng, 3) if rng is not None else [None] * 3
    h = dropout(keys[0], x, drop, train)
    h = lrelu(linear(p["c0"], h))
    h = dropout(keys[1], h, drop, train)
    h = lrelu(linear(p["c1"], h))
    h = dropout(keys[2], h, drop, train)
    h = lrelu(linear(p["c2"], h))
    return linear(p["c3"], h)
