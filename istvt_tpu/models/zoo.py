"""Model zoo registrations (reference registry keys: network/models.py:36-182).

Each builder returns a `Model` bundle. Clip models take (B, T, H, W, 3) NHWC
clips; frame models take (B, H, W, 3) images.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models import istvt as istvt_mod
from istvt_tpu.models import vivit as vivit_mod
from istvt_tpu.models import xception as xception_mod
from istvt_tpu.models.registry import Model, register
from istvt_tpu.nn.layers import dropout as _dropout
from istvt_tpu.nn.layers import global_avg_pool, linear, linear_init, relu


def _istvt_builder(name: str):
    def build(num_out_classes=1, dropout=0.5, cfg: ISTVTConfig = None, **kw):
        cfg = cfg or ISTVTConfig(num_classes=num_out_classes)

        def apply(params, state, clips, train=False, rng=None, **akw):
            return istvt_mod.apply(params, state, clips, cfg, train=train,
                                   rng=rng, **akw)

        return Model(name=name, config=cfg,
                     init=lambda rng: istvt_mod.init(rng, cfg),
                     apply=apply)
    return build


# 'istvt' is our canonical name; 'resnet_3d' is the reference's registry key
# for the trained ISTVT (reference models.py:180, models_copy.py:175).
register("istvt")(_istvt_builder("istvt"))
register("resnet_3d")(_istvt_builder("resnet_3d"))


def _stem_transformer_builder(name, init_fn, apply_fn):
    """ViViT / VanillaTr over the shared Xception low-level stem, the same
    composition as XceptionVidTr (reference vivit.py:193-208)."""
    def build(num_out_classes=1, dropout=0.5, cfg: ISTVTConfig = None, **kw):
        cfg = cfg or ISTVTConfig(num_classes=num_out_classes)

        def init(rng):
            k1, k2 = jax.random.split(rng)
            xp, xs = xception_mod.init(
                k1, xception_mod.XceptionConfig(num_classes=2))
            return {"xcep": xp, "vit": init_fn(k2, cfg)}, {"xcep": xs}

        def apply(params, state, clips, train=False, rng=None):
            b, t, hh, ww, c = clips.shape
            x = clips.reshape(b * t, hh, ww, c)
            feats, ns = xception_mod.low_level_features(
                params["xcep"], state["xcep"], x, train)
            fh = feats.shape[1]
            feats = feats.reshape(b, t, fh, fh, feats.shape[-1])
            out = apply_fn(params["vit"], feats, cfg, train=train, rng=rng)
            return out, {"xcep": ns}

        return Model(name=name, config=cfg, init=init, apply=apply)
    return build


register("vivit")(_stem_transformer_builder(
    "vivit", vivit_mod.vivit_init, vivit_mod.vivit_apply))
register("vanilla_tr")(_stem_transformer_builder(
    "vanilla_tr", vivit_mod.vanilla_tr_init, vivit_mod.vanilla_tr_apply))


@register("xception")
def _xception(num_out_classes=2, dropout=0.5, **kw):
    """Per-frame Xception classifier: the reference TransferModel replaces
    the fc head with Dropout + Linear(2048, num_out_classes)
    (reference models.py:40-47)."""
    cfg = xception_mod.XceptionConfig(num_classes=num_out_classes)

    def init(rng):
        p, s = xception_mod.init(rng, cfg)
        return p, s

    def apply(params, state, images, train=False, rng=None):
        feats, ns = xception_mod.features(params, state, images, train)
        x = relu(feats)
        x = global_avg_pool(x)
        x = _dropout(rng, x, dropout, train)
        return linear(params["fc"], x), ns

    extras = {
        "features": lambda p, s, x, train=False: xception_mod.features(p, s, x, train),
        "low_level_features": lambda p, s, x, train=False:
            xception_mod.low_level_features(p, s, x, train),
    }
    return Model(name="xception", config=cfg, init=init, apply=apply,
                 extras=extras)


def _meso_builder(name, init_fn, apply_fn):
    def build(num_out_classes=2, dropout=0.5, **kw):
        def apply(params, state, images, train=False, rng=None):
            return apply_fn(params, state, images, train=train, rng=rng,
                            drop=dropout)
        return Model(name=name, config=None,
                     init=lambda rng: init_fn(rng, num_out_classes),
                     apply=apply)
    return build


# registry keys 'mesonet'/'mesoincep' (reference models.py:64-71)
from istvt_tpu.models import mesonet as _mesonet  # noqa: E402

register("mesonet")(_meso_builder("mesonet", _mesonet.meso4_init,
                                  _mesonet.meso4_apply))
register("mesoincep")(_meso_builder("mesoincep",
                                    _mesonet.mesoinception4_init,
                                    _mesonet.mesoinception4_apply))


# 3D ResNets (reference network/resnet_3d.py `generate_model`,
# network/resnet3d/models/resnet.py `i3_res50[_nl]`)
from istvt_tpu.models import resnet3d as _r3d  # noqa: E402


def _resnet3d_builder(depth: int):
    def build(num_out_classes=1, dropout=0.0, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _r3d.init(rng, model_depth=depth,
                                  n_classes=num_out_classes)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, clips, train=False, rng=None):
            return _r3d.apply(params, state, clips, holder["cfg"],
                              train=train, rng=rng, drop=dropout)

        return Model(name=f"resnet3d_{depth}", config=None, init=init,
                     apply=apply)
    return build


for _d in (10, 18, 34, 50, 101):
    register(f"resnet3d_{_d}")(_resnet3d_builder(_d))


def _i3d_builder(use_nl: bool):
    name = "i3d_r50_nl" if use_nl else "i3d_r50"

    def build(num_out_classes=400, dropout=0.5, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _r3d.i3d_init(rng, num_classes=num_out_classes,
                                      use_nl=use_nl)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, clips, train=False, rng=None):
            if clips.ndim == 7:   # (B, clips, crops, T, H, W, 3) multi-eval
                return (_r3d.i3d_forward_multi(params, state, clips,
                                               holder["cfg"], train), state)
            return _r3d.i3d_apply(params, state, clips, holder["cfg"],
                                  train=train, rng=rng, drop=dropout)

        return Model(name=name, config=None, init=init, apply=apply)
    return build


register("i3d_r50")(_i3d_builder(False))
register("i3d_r50_nl")(_i3d_builder(True))


# EfficientNet family (reference models.py:72-101 'efficientnet' = b2,
# 'efficientnet_cdc' = b3 with 2048-d _fc; efficientnet_cdc.py)
from istvt_tpu.models import efficientnet as _effnet  # noqa: E402


def _effnet_builder(name, model_name, cdc: bool):
    def build(num_out_classes=1, dropout=0.5, cdc_theta=None, **kw):
        # The reference declares theta=0.7 for CDC convs but keeps the
        # difference term commented out (utils.py:249,289-293), so parity
        # default is 0.0; pass cdc_theta=0.7 to actually enable CDC.
        theta = cdc_theta if cdc_theta is not None else 0.0
        holder = {}

        def init(rng):
            k1, k2 = jax.random.split(rng)
            p, s, cfg = _effnet.init(k1, model_name=model_name,
                                     feature_dim=2048)
            holder["cfg"] = cfg
            # TransferModel-style classifier on the 2048-d feature
            # (reference models.py:40-47)
            p["classifier"] = linear_init(k2, 2048, num_out_classes)
            return p, s

        def apply(params, state, images, train=False, rng=None):
            feats, ns = _effnet.apply(
                {k: v for k, v in params.items() if k != "classifier"},
                state, images, holder["cfg"], train=train, rng=rng,
                cdc_theta=theta if cdc else 0.0)
            out = _dropout(rng, feats, dropout, train)
            return linear(params["classifier"], out), ns

        return Model(name=name, config=None, init=init, apply=apply)
    return build


register("efficientnet")(_effnet_builder("efficientnet",
                                         "efficientnet-b2", False))
register("efficientnet_cdc")(_effnet_builder("efficientnet_cdc",
                                             "efficientnet-b3", True))


# Perceiver over dual frequency views (reference dual_net.py:134-161)
from istvt_tpu.models import perceiver as _perceiver  # noqa: E402


@register("dual_perceiver")
def _dual_perceiver(num_out_classes=1, dropout=0.0, **kw):
    holder = {}

    def init(rng):
        p, cfg = _perceiver.init(rng, input_channels=6,
                                 num_classes=num_out_classes,
                                 depth=kw.get("depth", 6),
                                 num_latents=kw.get("num_latents", 256),
                                 latent_dim=kw.get("latent_dim", 512))
        holder["cfg"] = cfg
        return p, {}

    def apply(params, state, images, train=False, rng=None):
        views = images if isinstance(images, (list, tuple)) \
            else (images, images)
        out, _, _, _ = _perceiver.dual_perceiver_apply(params, views,
                                                       holder["cfg"])
        return out, state

    return Model(name="dual_perceiver", config=None, init=init, apply=apply)


# MAT texture nets (reference network/vivit/texture.py:222-315)
from istvt_tpu.models import mat as _mat  # noqa: E402


def _mat_builder(name, truncated: bool):
    def build(num_out_classes=2, dropout=0.5, m=100, **kw):
        holder = {}

        def init(rng):
            if truncated:
                p, s, cfg = _mat.netrunc_init(rng, num_out_classes)
            else:
                p, s, cfg = _mat.mat_init(rng, num_out_classes, m=m)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, images, train=False, rng=None):
            if truncated:
                return _mat.netrunc_apply(params, state, images,
                                          holder["cfg"], train, rng,
                                          dropout)
            (logits, aux), ns = _mat.mat_apply(params, state, images,
                                               holder["cfg"], train, rng)
            return logits, ns

        return Model(name=name, config=None, init=init, apply=apply)
    return build


register("mat")(_mat_builder("mat", False))
register("netrunc")(_mat_builder("netrunc", True))


# 2D ResNets (reference models.py:48-63) + UNet family
from istvt_tpu.models import resnet2d as _r2d  # noqa: E402
from istvt_tpu.models import unet as _unet  # noqa: E402


def _resnet2d_builder(depth):
    def build(num_out_classes=2, dropout=0.5, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _r2d.init(rng, depth, num_out_classes)
            holder["cfg"] = dict(cfg, dropout=dropout or 0.0)
            return p, s

        def apply(params, state, images, train=False, rng=None):
            return _r2d.apply(params, state, images, holder["cfg"], train,
                              rng)

        return Model(name=f"resnet{depth}", config=None, init=init,
                     apply=apply)
    return build


register("resnet18")(_resnet2d_builder(18))
register("resnet50")(_resnet2d_builder(50))


def _modified_unet_builder(name, mode, classifier="efficientnet-b2"):
    def build(num_out_classes=2, dropout=0.5, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _unet.modified_unet_init(rng, 3, 3, mode=mode,
                                                 classifier=classifier)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, images, train=False, rng=None):
            (reg, cla, feats), ns = _unet.modified_unet_apply(
                params, state, images, holder["cfg"], train, rng)
            return cla, ns

        def apply_full(params, state, images, train=False, rng=None):
            return _unet.modified_unet_apply(params, state, images,
                                             holder["cfg"], train, rng)

        def apply_triple(params, state, a, pp, n, train=False, rng=None):
            return _unet.triple_apply(apply_full, params, state, a, pp, n,
                                      train=train, rng=rng)

        return Model(name=name, config=None, init=init, apply=apply,
                     extras={"forward_full": apply_full,
                             "forward_triple": apply_triple})
    return build


# reference keys: unet_efficientnet_{add,mul}, tripunet_efficientnet_{add,
# mul} (triple wrappers share the same weights), unet_resnet
register("unet_efficientnet_add")(
    _modified_unet_builder("unet_efficientnet_add", "add"))
register("unet_efficientnet_mul")(
    _modified_unet_builder("unet_efficientnet_mul", "mul"))
register("tripunet_efficientnet_add")(
    _modified_unet_builder("tripunet_efficientnet_add", "add"))
register("tripunet_efficientnet_mul")(
    _modified_unet_builder("tripunet_efficientnet_mul", "mul"))
register("unet_resnet")(
    _modified_unet_builder("unet_resnet", "add", classifier="resnet18"))


def _trip_effnet_builder(name):
    def build(num_out_classes=2, dropout=0.5, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _unet.trip_efficientnet_init(rng, num_out_classes)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, images, train=False, rng=None):
            (feats, clas), ns = _unet.trip_efficientnet_apply(
                params, state, [images], holder["cfg"], train, rng)
            return clas[0], ns

        def apply_multi(params, state, inputs, train=False, rng=None):
            return _unet.trip_efficientnet_apply(params, state, inputs,
                                                 holder["cfg"], train, rng)

        return Model(name=name, config=None, init=init, apply=apply,
                     extras={"forward_multi": apply_multi})
    return build


for _k in ("triplet_efficientnet", "triplet_efficientnet_cdc",
           "quadplet_efficientnet"):
    register(_k)(_trip_effnet_builder(_k))


def _quadnet_builder(name, id_len=896, use_full=False,
                     model="efficientnet-b4", head="linear"):
    def build(num_out_classes=2, dropout=0.5, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _unet.quadnet_encoder_init(rng, id_len=id_len,
                                                   use_full=use_full,
                                                   model=model, head=head)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, images, train=False, rng=None):
            (gs, ids, clas, gf, idf), ns = _unet.quadnet_encoder_apply(
                params, state, [images], holder["cfg"], train, rng)
            return clas[0], ns

        def apply_multi(params, state, inputs, train=False, rng=None):
            return _unet.quadnet_encoder_apply(params, state, inputs,
                                               holder["cfg"], train, rng)

        return Model(name=name, config=None, init=init, apply=apply,
                     extras={"forward_multi": apply_multi})
    return build


# key -> class mapping per reference models.py:116-132:
# quadnet[_full] -> QuadEfficientNetLite (b2, id 704), quadnet_conv ->
# QuadEfficientNet (conv heads), quadnet_dfc -> ...DoubleFC,
# quadnet_decoder -> QuadnetEncoder (b4, id 896)
register("quadnet")(_quadnet_builder(
    "quadnet", id_len=704, model="efficientnet-b2"))
register("quadnet_full")(_quadnet_builder(
    "quadnet_full", id_len=704, use_full=True, model="efficientnet-b2"))
register("quadnet_conv")(_quadnet_builder(
    "quadnet_conv", model="efficientnet-b2", head="conv"))
register("quadnet_dfc")(_quadnet_builder(
    "quadnet_dfc", id_len=704, model="efficientnet-b2", head="dfc"))
register("quadnet_decoder")(_quadnet_builder("quadnet_decoder"))
# quadnet_landmark: QuadnetEncoder + QuadnetLandmarkDecoder side model
# (reference train_CNN.py:97-99 + models usage)
register("quadnet_landmark")(_quadnet_builder("quadnet_landmark"))


@register("landmark_decoder")
def _landmark_decoder(num_out_classes=1, dropout=0.0, **kw):
    def init(rng):
        return _unet.quadnet_landmark_decoder_init(rng)

    def apply(params, state, feats, train=False, rng=None):
        return _unet.quadnet_landmark_decoder_apply(params, state, feats,
                                                    train)

    return Model(name="landmark_decoder", config=None, init=init,
                 apply=apply)


@register("decoder")
def _decoder(num_out_classes=3, dropout=0.0, **kw):
    def init(rng):
        return _unet.quadnet_decoder_init(rng, 1408, 3)

    def apply(params, state, feats, train=False, rng=None):
        return _unet.quadnet_decoder_apply(params, state, feats, train)

    return Model(name="decoder", config=None, init=init, apply=apply)


def _ensemble_builder(name, model="efficientnet-b2", with_jigsaw=False,
                      with_compression=False, num_nets=3):
    def build(num_out_classes=2, dropout=0.5, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _unet.ensemble_en_init(
                rng, num_nets, model, num_out_classes,
                with_jigsaw=with_jigsaw, with_compression=with_compression)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, images, train=False, rng=None):
            inputs = images if isinstance(images, (list, tuple)) \
                else [images] * num_nets
            (clas, feats, idxs, c_clas), ns = _unet.ensemble_en_apply(
                params, state, inputs, holder["cfg"], train, rng)
            return sum(clas) / len(clas), ns

        def apply_multi(params, state, inputs, train=False, rng=None):
            return _unet.ensemble_en_apply(params, state, inputs,
                                           holder["cfg"], train, rng)

        return Model(name=name, config=None, init=init, apply=apply,
                     extras={"forward_multi": apply_multi})
    return build


register("multi_efficientnet")(_ensemble_builder("multi_efficientnet"))
register("trip_multi_en")(_ensemble_builder("trip_multi_en"))
register("jigsaw_multi_en")(_ensemble_builder(
    "jigsaw_multi_en", with_jigsaw=True))
register("jigsaw_multi_en_adv")(_ensemble_builder(
    "jigsaw_multi_en_adv", with_jigsaw=True, with_compression=True))


@register("fusion_efficientnet")
def _fusion_en(num_out_classes=2, dropout=0.3, **kw):
    holder = {}

    def init(rng):
        p, s, cfg = _unet.fusion_en_init(rng, 3)
        holder["cfg"] = cfg
        return p, s

    def apply(params, state, images, train=False, rng=None):
        inputs = images if isinstance(images, (list, tuple)) \
            else [images] * 3
        (fused, clas), ns = _unet.fusion_en_apply(params, state, inputs,
                                                  holder["cfg"], train, rng)
        return fused, ns

    return Model(name="fusion_efficientnet", config=None, init=init,
                 apply=apply)


@register("multi_xception")
def _multi_xcep(num_out_classes=2, dropout=0.5, **kw):
    def init(rng):
        return _unet.ensemble_xcep_init(rng, 3)

    def apply(params, state, images, train=False, rng=None):
        inputs = images if isinstance(images, (list, tuple)) \
            else [images] * 3
        (clas, feats, s_attns, _), ns = _unet.ensemble_xcep_apply(
            params, state, inputs, train, rng, dropout)
        return sum(clas) / len(clas), ns

    return Model(name="multi_xception", config=None, init=init, apply=apply)


def _cross_xcep_builder(name):
    def build(num_out_classes=2, dropout=0.5, **kw):
        def init(rng):
            return _unet.cross_attention_xception_init(rng, 2)

        def apply(params, state, images, train=False, rng=None):
            inputs = images if isinstance(images, (list, tuple)) \
                else [images, images]
            (clas, att), ns = _unet.cross_attention_xception_apply(
                params, state, inputs, train, rng, dropout)
            return sum(clas) / len(clas), ns

        return Model(name=name, config=None, init=init, apply=apply)
    return build


register("mixed_xcep")(_cross_xcep_builder("mixed_xcep"))
register("xception_dg")(_cross_xcep_builder("xception_dg"))


@register("unetplus_efficientnet")
def _unetplus(num_out_classes=2, dropout=0.5, **kw):
    """UNet++ residual map + EfficientNet classifier on x + residual
    (reference UnetNestEN/TripUNetPlus, unet.py:925-955)."""
    holder = {}

    def init(rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        up, us, ucfg = _unet.unet_nested_init(k1, 3, 3)
        ep, es, ecfg = _effnet.init(k2, "efficientnet-b2",
                                    include_head=False)
        holder["ucfg"], holder["ecfg"] = ucfg, ecfg
        p = {"unet": up, "cls": ep,
             "fc": linear_init(k3, 1408, num_out_classes)}
        return p, {"unet": us, "cls": es}

    def apply(params, state, images, train=False, rng=None):
        reg, uns = _unet.unet_nested_apply(params["unet"], state["unet"],
                                           images, holder["ucfg"], train)
        feats, ens = _effnet.extract_features(params["cls"], state["cls"],
                                              images + reg, holder["ecfg"],
                                              train, rng)
        cla = linear(params["fc"], jnp.mean(feats, axis=(1, 2)))
        return cla, {"unet": uns, "cls": ens}

    return Model(name="unetplus_efficientnet", config=None, init=init,
                 apply=apply)


# Fastformer family: 'fastformer' -> CvT (reference models.py:158,174);
# FastTransformer additive-attention ViT (fast_transformer_torch.py)
from istvt_tpu.models import cvt as _cvt  # noqa: E402
from istvt_tpu.models import fastformer as _fastformer  # noqa: E402


@register("fastformer")
def _fastformer_cvt(num_out_classes=1, dropout=0.5, **kw):
    def apply(params, state, images, train=False, rng=None):
        return _cvt.apply(params, state, images, train=train, rng=rng)
    return Model(name="fastformer", config=None,
                 init=lambda rng: _cvt.init(rng, num_classes=num_out_classes),
                 apply=apply)


@register("fast_transformer")
def _fast_transformer(num_out_classes=1, dropout=0.5, image_size=224,
                      depth=4, dim=512, use_rotary=True, **kw):
    holder = {}

    def init(rng):
        p, cfg = _fastformer.fast_transformer_init(
            rng, num_tokens=num_out_classes, dim=dim, depth=depth,
            image_size=image_size, use_rotary=use_rotary)
        holder["cfg"] = cfg
        return p, {}

    def apply(params, state, images, train=False, rng=None):
        out = _fastformer.fast_transformer_apply(params, images,
                                                 holder["cfg"],
                                                 train=train, rng=rng)
        return out, state

    return Model(name="fast_transformer", config=None, init=init, apply=apply)


# DualNet / F3-Net-style frequency models (reference registry keys
# 'jigsaw_multi_xcep_adv[_pair]' -> DualNet, models.py:160-168)
from istvt_tpu.models import dualnet as _dualnet  # noqa: E402


def _dualnet_builder(name):
    def build(num_out_classes=1, dropout=0.2, img_size=300, **kw):
        holder = {}

        def init(rng):
            p, s, cfg = _dualnet.init(rng, num_classes=num_out_classes,
                                      img_size=img_size)
            holder["cfg"] = cfg
            return p, s

        def apply(params, state, images, train=False, rng=None):
            (logits, feat, a, b), ns = _dualnet.apply(
                params, state, images, holder["cfg"], train=train, rng=rng,
                drop=dropout)
            return logits, ns

        def apply_full(params, state, images, train=False, rng=None):
            return _dualnet.apply(params, state, images, holder["cfg"],
                                  train=train, rng=rng, drop=dropout)

        return Model(name=name, config=None, init=init, apply=apply,
                     extras={"forward_full": apply_full})
    return build


for _k in ("dualnet", "jigsaw_multi_xcep_adv", "jigsaw_multi_xcep_adv_pair"):
    register(_k)(_dualnet_builder(_k))


@register("xception_concat")
def _xception_concat(num_out_classes=2, dropout=0.5, **kw):
    """15-channel frame-stack variant (reference xception.py:224-343):
    5 frames concatenated on channels; low_level_features runs through
    block9."""
    cfg = xception_mod.XceptionConfig(num_classes=num_out_classes,
                                      in_channels=15, low_level_through=9)

    def init(rng):
        return xception_mod.init(rng, cfg)

    def apply(params, state, images, train=False, rng=None):
        feats, ns = xception_mod.features(params, state, images, train)
        x = relu(feats)
        x = global_avg_pool(x)
        x = _dropout(rng, x, dropout, train)
        return linear(params["fc"], x), ns

    return Model(name="xception_concat", config=cfg, init=init, apply=apply)
