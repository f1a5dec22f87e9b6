"""Legacy vision-encoder zoo (the reference's VIS_ENCODERS registry,
simvg/models/vis_encs/__init__.py:1-16).

SimVG's shipped configs always use the joint BEiT-3 encoder; this zoo
exists for SeqTR-era compositions (vis_enc + lan_enc + fusion + head)
and mirrors the reference's registry surface one architecture family
per class:

================================  =======================================
reference                          here
================================  =======================================
DarkNet53        (darknet.py)      DarkNet53
DarknetMM        (darknetmm.py)    DarkNet53 (same math; the MM variant
                                   differs only in mmcv plumbing)
CSPDarknet       (cspdarknet.py)   CSPDarknet
ResNet / ResNetMM (resnet*.py)     vis_encs.ResNetEncoder
SwinTransformer(+MM) (swin*.py)    SwinTransformer
PyramidVisionTransformerV2(+MM,
  +MMMix, PVT-MM)  (pvt*.py)       PyramidVisionTransformerV2
ConvolutionalVisionTransformerMix
                 (cvt.py)          CvTMix
VIT              (vit.py)          vis_encs.ViTEncoder
VisionTransformerMix (vit_mix.py)  ViTMix
VITDet           (vitdet.py)       ViTDet
YOLOS            (vit_yolos.py)    YOLOSEncoder
ViLTransformerSS (VILT/)           ViLTEncoder
================================  =======================================

TPU-first design choices (deliberate deviations, same role):
- GroupNorm replaces BatchNorm in the conv backbones: stateless under
  jit (no mutable running stats, no cross-device stat sync), same
  normalization role.  The transformer families use LayerNorm exactly
  like the reference.
- Static shapes throughout; Swin's shifted-window attention masks are
  precomputed with numpy at trace time.
- All attention routes through simvg_tpu.ops.attention (fp32 softmax,
  optional Pallas kernel).

Interfaces:
- pure-vision backbones:  __call__(images NHWC, deterministic) ->
  feature grid [B, h, w, C] (stride-32 final stage), matching
  vis_encs.ResNetEncoder / ViTEncoder.
- mixed VL encoders (the reference's ``forward(x, y)`` families):
  __call__(images, text_feat, text_mask, deterministic) -> dict with
  ``img_feat`` [B, h, w, C] and ``text_feat`` [B, T, C] (plus
  ``cls_feat`` / ``det_tokens`` where the architecture has them).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from simvg_tpu.ops.attention import multihead_attention


# ---------------------------------------------------------------------------
# shared building blocks
# ---------------------------------------------------------------------------

def _gn(ch: int, name: str):
    from simvg_tpu.models.vis_encs import adaptive_group_norm

    return adaptive_group_norm(ch, name)


def _conv(ch, k, s, name, dtype, groups=1, bias=False):
    pad = (k - 1) // 2
    return nn.Conv(ch, (k, k), strides=(s, s),
                   padding=[(pad, pad), (pad, pad)],
                   feature_group_count=groups, use_bias=bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _dense(ch, name, dtype):
    return nn.Dense(ch, dtype=dtype, param_dtype=jnp.float32, name=name)


def _ln(name):
    return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                        name=name)


# ---------------------------------------------------------------------------
# DarkNet53  (reference simvg/models/vis_encs/darknet.py:28-101,
# darknetmm.py:17-221)
# ---------------------------------------------------------------------------

class DarkNet53(nn.Module):
    """Darknet-53: stem conv then 5 stages of (stride-2 conv +
    n residual [1x1 half -> 3x3 full] blocks); LeakyReLU(0.1)."""

    stage_blocks: Sequence[int] = (1, 2, 8, 8, 4)
    stage_widths: Sequence[int] = (64, 128, 256, 512, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        act = lambda h: nn.leaky_relu(h, 0.1)  # noqa: E731
        x = _conv(32, 3, 1, "stem", self.dtype)(images.astype(self.dtype))
        x = act(_gn(32, "stem_n")(x).astype(self.dtype))
        for si, (n, w) in enumerate(zip(self.stage_blocks,
                                        self.stage_widths)):
            x = _conv(w, 3, 2, f"s{si}_down", self.dtype)(x)
            x = act(_gn(w, f"s{si}_down_n")(x).astype(self.dtype))
            for bi in range(n):
                res = x
                h = _conv(w // 2, 1, 1, f"s{si}b{bi}c1", self.dtype)(x)
                h = act(_gn(w // 2, f"s{si}b{bi}n1")(h).astype(self.dtype))
                h = _conv(w, 3, 1, f"s{si}b{bi}c2", self.dtype)(h)
                h = act(_gn(w, f"s{si}b{bi}n2")(h).astype(self.dtype))
                x = res + h
        return x


# ---------------------------------------------------------------------------
# CSPDarknet  (reference simvg/models/vis_encs/cspdarknet.py:17-266:
# Focus stem, CSP stages, SPP bottleneck in the last stage)
# ---------------------------------------------------------------------------

class CSPDarknet(nn.Module):
    stage_blocks: Sequence[int] = (1, 3, 3, 1)
    stage_widths: Sequence[int] = (128, 256, 512, 1024)
    dtype: Any = jnp.float32
    spp_kernels: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        dt = self.dtype
        act = nn.silu

        def cba(h, ch, k, s, name):
            h = _conv(ch, k, s, name, dt)(h)
            return act(_gn(ch, name + "_n")(h).astype(dt))

        # Focus: space-to-depth (2x2 -> channels) + conv
        # (cspdarknet.py:17-47)
        x = images.astype(dt)
        b, hh, ww, c = x.shape
        x = x.reshape(b, hh // 2, 2, ww // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh // 2, ww // 2,
                                                  4 * c)
        x = cba(x, 64, 3, 1, "focus")

        for si, (n, w) in enumerate(zip(self.stage_blocks,
                                        self.stage_widths)):
            x = cba(x, w, 3, 2, f"s{si}_down")
            if si == len(self.stage_blocks) - 1:
                # SPP bottleneck (cspdarknet.py:66-106)
                h = cba(x, w // 2, 1, 1, f"s{si}_spp_in")
                pools = [h] + [
                    nn.max_pool(h, (k, k), strides=(1, 1),
                                padding=((k // 2, k // 2),
                                         (k // 2, k // 2)))
                    for k in self.spp_kernels
                ]
                x = cba(jnp.concatenate(pools, -1), w, 1, 1,
                        f"s{si}_spp_out")
            # CSP: split into main (bottlenecks) and shortcut paths
            main = cba(x, w // 2, 1, 1, f"s{si}_main_in")
            short = cba(x, w // 2, 1, 1, f"s{si}_short")
            for bi in range(n):
                res = main
                h = cba(main, w // 2, 1, 1, f"s{si}b{bi}c1")
                h = cba(h, w // 2, 3, 1, f"s{si}b{bi}c2")
                main = res + h
            x = cba(jnp.concatenate([main, short], -1), w, 1, 1,
                    f"s{si}_fuse")
        return x


# ---------------------------------------------------------------------------
# Swin Transformer  (reference simvg/models/vis_encs/swin.py:1-35 wraps
# the standard model; swin_mm.py:1-737 is the mmdet port.  Implemented
# natively: window attention with relative position bias, shifted
# windows with the precomputed cyclic-shift mask, patch merging.)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32


def _win_partition(x, w):
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _win_reverse(x, w, h, ww):
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def _swin_shift_mask(h, w, win, shift):
    """Attention mask for shifted windows (numpy, trace-time static)."""
    img = np.zeros((1, h, w, 1), np.int32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift),
                   slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    x = img.reshape(1, h // win, win, w // win, win, 1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win)
    diff = x[:, :, None] - x[:, None, :]
    return np.where(diff != 0, -1e30, 0.0).astype(np.float32)


class _WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int
    dtype: Any

    @nn.compact
    def __call__(self, x, bias):
        """x [nW*B, win*win, C]; bias additive [nW, 1, N, N] or None."""
        w = self.window
        n = w * w
        rel = self.param(
            "rel_pos_bias", nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) ** 2, self.heads), jnp.float32,
        )
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                      indexing="ij")).reshape(2, -1)
        d = coords[:, :, None] - coords[:, None, :]
        idx = (d[0] + w - 1) * (2 * w - 1) + (d[1] + w - 1)
        rpb = rel[idx.reshape(-1)].reshape(n, n, self.heads)
        rpb = rpb.transpose(2, 0, 1)[None]  # [1, H, N, N]
        attn_bias = rpb if bias is None else rpb + bias
        qkv = _dense(3 * self.dim, "qkv", self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, -1)
        out = multihead_attention(q, k, v, num_heads=self.heads,
                                  attn_bias=attn_bias, dtype=self.dtype)
        return _dense(self.dim, "proj", self.dtype)(out)


class SwinTransformer(nn.Module):
    cfg: SwinConfig = SwinConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        ps = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=dt, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(dt))
        x = _ln("patch_norm")(x).astype(dt)

        dim = cfg.embed_dim
        for si, (depth, heads) in enumerate(zip(cfg.depths,
                                                cfg.num_heads)):
            b, h, w, _ = x.shape
            win = min(cfg.window, h, w)
            pad_h = (-h) % win
            pad_w = (-w) % win
            hp, wp = h + pad_h, w + pad_w
            for bi in range(depth):
                shift = win // 2 if (bi % 2 == 1 and win < min(hp, wp)) \
                    else 0
                res = x
                hx = _ln(f"s{si}b{bi}_ln1")(x).astype(dt)
                if pad_h or pad_w:
                    hx = jnp.pad(hx, ((0, 0), (0, pad_h), (0, pad_w),
                                      (0, 0)))
                if shift:
                    hx = jnp.roll(hx, (-shift, -shift), axis=(1, 2))
                    mask = jnp.asarray(
                        _swin_shift_mask(hp, wp, win, shift)
                    )[:, None, :, :]  # [nW, 1, N, N]
                    mask = jnp.tile(mask, (b, 1, 1, 1))
                else:
                    mask = None
                wx = _win_partition(hx, win)
                wx = _WindowAttention(dim, heads, win, dt,
                                      name=f"s{si}b{bi}_attn")(wx, mask)
                hx = _win_reverse(wx, win, hp, wp)
                if shift:
                    hx = jnp.roll(hx, (shift, shift), axis=(1, 2))
                hx = hx[:, :h, :w]
                x = res + hx
                res = x
                hx = _ln(f"s{si}b{bi}_ln2")(x).astype(dt)
                hx = _dense(int(dim * cfg.mlp_ratio),
                            f"s{si}b{bi}_fc1", dt)(hx)
                hx = nn.gelu(hx, approximate=False)
                hx = _dense(dim, f"s{si}b{bi}_fc2", dt)(hx)
                x = res + hx
            if si < len(cfg.depths) - 1:
                # patch merging: 2x2 neighborhood concat + linear
                b, h, w, c = x.shape
                if h % 2 or w % 2:
                    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2),
                                    (0, 0)))
                    b, h, w, c = x.shape
                x = x.reshape(b, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 2, w // 2, 4 * c)
                x = _ln(f"merge{si}_ln")(x).astype(dt)
                dim *= 2
                x = _dense(dim, f"merge{si}_proj", dt)(x)
        return _ln("final_ln")(x).astype(dt)


# ---------------------------------------------------------------------------
# PVTv2  (reference simvg/models/vis_encs/pvtv2.py:1-35 + pvt_mm.py
# SpatialReductionAttention:88-218, MixFFN:26-86)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PVTv2Config:
    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (2, 2, 2, 2)
    heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    dtype: Any = jnp.float32


class PyramidVisionTransformerV2(nn.Module):
    cfg: PVTv2Config = PVTv2Config()

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        x = images.astype(dt)
        for si, (dim, depth, heads, sr, mr) in enumerate(zip(
                cfg.dims, cfg.depths, cfg.heads, cfg.sr_ratios,
                cfg.mlp_ratios)):
            # overlapping patch embed (k=7,s=4 first; k=3,s=2 after)
            k, s = (7, 4) if si == 0 else (3, 2)
            x = _conv(dim, k, s, f"s{si}_embed", dt, bias=True)(x)
            x = _ln(f"s{si}_embed_ln")(x).astype(dt)
            b, h, w, _ = x.shape
            seq = x.reshape(b, h * w, dim)
            for bi in range(depth):
                res = seq
                hx = _ln(f"s{si}b{bi}_ln1")(seq).astype(dt)
                q = _dense(dim, f"s{si}b{bi}_q", dt)(hx)
                if sr > 1:
                    kv_in = _conv(dim, sr, sr, f"s{si}b{bi}_sr", dt,
                                  bias=True)(hx.reshape(b, h, w, dim))
                    kv_in = _ln(f"s{si}b{bi}_srln")(kv_in).astype(dt)
                    kv_in = kv_in.reshape(b, -1, dim)
                else:
                    kv_in = hx
                kk = _dense(dim, f"s{si}b{bi}_k", dt)(kv_in)
                vv = _dense(dim, f"s{si}b{bi}_v", dt)(kv_in)
                a = multihead_attention(q, kk, vv, num_heads=heads,
                                        dtype=dt)
                seq = res + _dense(dim, f"s{si}b{bi}_proj", dt)(a)
                res = seq
                # MixFFN: fc1 -> depthwise 3x3 conv -> gelu -> fc2
                hx = _ln(f"s{si}b{bi}_ln2")(seq).astype(dt)
                hx = _dense(dim * mr, f"s{si}b{bi}_fc1", dt)(hx)
                hx = hx.reshape(b, h, w, dim * mr)
                hx = _conv(dim * mr, 3, 1, f"s{si}b{bi}_dw", dt,
                           groups=dim * mr, bias=True)(hx)
                hx = nn.gelu(hx.reshape(b, h * w, dim * mr),
                             approximate=False)
                seq = res + _dense(dim, f"s{si}b{bi}_fc2", dt)(hx)
            x = _ln(f"s{si}_out_ln")(seq).astype(dt).reshape(b, h, w, dim)
        return x


# ---------------------------------------------------------------------------
# Mixed vision-language transformers: the reference's forward(x, y)
# family.  Shared block: joint self-attention over [image; text].
# ---------------------------------------------------------------------------

class _JointBlock(nn.Module):
    """Pre-LN transformer block over the concatenated [img; text]
    sequence with a text key-padding mask (the fusion mechanism of
    vit_mix.py:55-178 / cvt.py:379-519 blocks)."""

    dim: int
    heads: int
    mlp_ratio: float
    dtype: Any

    @nn.compact
    def __call__(self, x, key_padding_mask):
        dt = self.dtype
        res = x
        h = _ln("ln1")(x).astype(dt)
        q = _dense(self.dim, "q", dt)(h)
        k = _dense(self.dim, "k", dt)(h)
        v = _dense(self.dim, "v", dt)(h)
        a = multihead_attention(q, k, v, num_heads=self.heads,
                                key_padding_mask=key_padding_mask,
                                dtype=dt)
        x = res + _dense(self.dim, "proj", dt)(a)
        res = x
        h = _ln("ln2")(x).astype(dt)
        h = _dense(int(self.dim * self.mlp_ratio), "fc1", dt)(h)
        h = nn.gelu(h, approximate=False)
        return res + _dense(self.dim, "fc2", dt)(h)


@dataclasses.dataclass(frozen=True)
class ViTMixConfig:
    patch_size: int = 16
    embed_dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32


class ViTMix(nn.Module):
    """VisionTransformerMix (vit_mix.py:181-241): plain ViT whose blocks
    attend jointly over image patches and projected text features."""

    cfg: ViTMixConfig = ViTMixConfig()

    @nn.compact
    def __call__(self, images, text_feat, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        ps = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=dt, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(dt))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h * w, d), jnp.float32)
        x = x + pos.astype(dt)
        t = _dense(d, "text_proj", dt)(text_feat.astype(dt))
        n_img, n_txt = x.shape[1], t.shape[1]
        if text_mask is None:
            text_mask = jnp.zeros((b, n_txt), bool)
        pad = jnp.concatenate(
            [jnp.zeros((b, n_img), bool), text_mask.astype(bool)], 1)
        seq = jnp.concatenate([x, t], axis=1)
        for i in range(cfg.num_layers):
            seq = _JointBlock(d, cfg.num_heads, cfg.mlp_ratio, dt,
                              name=f"block{i}")(seq, pad)
        seq = _ln("final_ln")(seq).astype(dt)
        return {
            "img_feat": seq[:, :n_img].reshape(b, h, w, d),
            "text_feat": seq[:, n_img:],
        }


@dataclasses.dataclass(frozen=True)
class CvTMixConfig:
    dims: Sequence[int] = (64, 192, 384)
    depths: Sequence[int] = (1, 2, 10)
    heads: Sequence[int] = (1, 3, 6)
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32


class CvTMix(nn.Module):
    """ConvolutionalVisionTransformerMix (cvt.py:260-568): conv token
    embedding per stage, depthwise-conv q/k/v projections, text joined
    in the final stage's joint attention."""

    cfg: CvTMixConfig = CvTMixConfig()

    @nn.compact
    def __call__(self, images, text_feat, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        x = images.astype(dt)
        b = x.shape[0]
        for si, (dim, depth, heads) in enumerate(zip(
                cfg.dims, cfg.depths, cfg.heads)):
            k, s = (7, 4) if si == 0 else (3, 2)
            x = _conv(dim, k, s, f"s{si}_embed", dt, bias=True)(x)
            x = _ln(f"s{si}_embed_ln")(x).astype(dt)
            _, h, w, _ = x.shape
            last = si == len(cfg.dims) - 1
            if last:
                t = _dense(dim, "text_proj", dt)(text_feat.astype(dt))
                n_txt = t.shape[1]
                if text_mask is None:
                    text_mask = jnp.zeros((b, n_txt), bool)
            for bi in range(depth):
                # conv projection (depthwise 3x3) for q/k/v
                # (cvt.py:123-155)
                res = x.reshape(b, h * w, dim)
                hx = _ln(f"s{si}b{bi}_ln1")(x).astype(dt)
                def proj(tag, stride):
                    hh = _conv(dim, 3, stride, f"s{si}b{bi}_{tag}dw",
                               dt, groups=dim)(hx)
                    hh = hh.reshape(b, -1, dim)
                    return _dense(dim, f"s{si}b{bi}_{tag}", dt)(hh)
                q = proj("q", 1)
                kk = proj("k", 2 if not last else 1)
                vv = proj("v", 2 if not last else 1)
                pad = None
                if last:
                    q = jnp.concatenate(
                        [q, _dense(dim, f"s{si}b{bi}_tq", dt)(t)], 1)
                    kk = jnp.concatenate(
                        [kk, _dense(dim, f"s{si}b{bi}_tk", dt)(t)], 1)
                    vv = jnp.concatenate(
                        [vv, _dense(dim, f"s{si}b{bi}_tv", dt)(t)], 1)
                    pad = jnp.concatenate(
                        [jnp.zeros((b, kk.shape[1] - n_txt), bool),
                         text_mask.astype(bool)], 1)
                a = multihead_attention(q, kk, vv, num_heads=heads,
                                        key_padding_mask=pad, dtype=dt)
                a_img = a[:, :h * w]
                seq = res + _dense(dim, f"s{si}b{bi}_proj", dt)(a_img)
                if last:
                    t = t + _dense(dim, f"s{si}b{bi}_tproj", dt)(
                        a[:, h * w:])
                res = seq
                hx = _ln(f"s{si}b{bi}_ln2")(seq).astype(dt)
                hx = _dense(int(dim * cfg.mlp_ratio),
                            f"s{si}b{bi}_fc1", dt)(hx)
                hx = nn.gelu(hx, approximate=False)
                seq = res + _dense(dim, f"s{si}b{bi}_fc2", dt)(hx)
                x = seq.reshape(b, h, w, dim)
        out = {"img_feat": _ln("final_ln")(x).astype(dt)}
        out["text_feat"] = _ln("final_text_ln")(t).astype(dt)
        return out


@dataclasses.dataclass(frozen=True)
class ViTDetConfig:
    patch_size: int = 16
    embed_dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    window: int = 4  # windowed blocks; every `global_every`-th is global
    global_every: int = 3
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32


class ViTDet(nn.Module):
    """VITDet (vitdet.py:200-459): plain ViT with interleaved
    windowed/global attention blocks; text passthrough contract of the
    reference's forward(x, y)."""

    cfg: ViTDetConfig = ViTDetConfig()

    @nn.compact
    def __call__(self, images, text_feat=None, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        ps = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=dt, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(dt))
        b, h, w, d = x.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h, w, d), jnp.float32)
        x = x + pos.astype(dt)
        win = min(cfg.window, h, w)
        pad_h, pad_w = (-h) % win, (-w) % win
        hp, wp = h + pad_h, w + pad_w
        for i in range(cfg.num_layers):
            is_global = (i + 1) % cfg.global_every == 0
            res = x
            hx = _ln(f"b{i}_ln1")(x).astype(dt)
            if not is_global:
                if pad_h or pad_w:
                    hx = jnp.pad(hx, ((0, 0), (0, pad_h), (0, pad_w),
                                      (0, 0)))
                seq = _win_partition(hx, win)
            else:
                seq = hx.reshape(b, h * w, d)
            q = _dense(d, f"b{i}_q", dt)(seq)
            k = _dense(d, f"b{i}_k", dt)(seq)
            v = _dense(d, f"b{i}_v", dt)(seq)
            a = multihead_attention(q, k, v, num_heads=cfg.num_heads,
                                    dtype=dt)
            a = _dense(d, f"b{i}_proj", dt)(a)
            if not is_global:
                a = _win_reverse(a, win, hp, wp)[:, :h, :w]
            else:
                a = a.reshape(b, h, w, d)
            x = res + a
            res = x
            hx = _ln(f"b{i}_ln2")(x).astype(dt)
            hx = _dense(int(d * cfg.mlp_ratio), f"b{i}_fc1", dt)(hx)
            hx = nn.gelu(hx, approximate=False)
            x = res + _dense(d, f"b{i}_fc2", dt)(hx)
        x = _ln("final_ln")(x).astype(dt)
        if text_feat is None:
            return x
        return {"img_feat": x, "text_feat": text_feat}


@dataclasses.dataclass(frozen=True)
class YOLOSConfig:
    patch_size: int = 16
    embed_dim: int = 384
    num_heads: int = 6
    num_layers: int = 12
    num_det_tokens: int = 100
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32


class YOLOSEncoder(nn.Module):
    """YOLOS (vit_yolos.py:96-455): ViT with learnable detection tokens
    appended to the patch sequence; returns both the patch grid and the
    refined det tokens."""

    cfg: YOLOSConfig = YOLOSConfig()

    @nn.compact
    def __call__(self, images, text_feat=None, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        ps = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=dt, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(dt))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, h * w, d), jnp.float32)
        det = self.param("det_tokens", nn.initializers.normal(0.02),
                         (1, cfg.num_det_tokens, d), jnp.float32)
        det_pos = self.param("det_pos", nn.initializers.normal(0.02),
                             (1, cfg.num_det_tokens, d), jnp.float32)
        seq = jnp.concatenate(
            [x + pos.astype(dt),
             jnp.broadcast_to((det + det_pos).astype(dt),
                              (b, cfg.num_det_tokens, d))], 1)
        n_img = h * w
        n_txt = 0
        pad = None
        if text_feat is not None:
            t = _dense(d, "text_proj", dt)(text_feat.astype(dt))
            n_txt = t.shape[1]
            seq = jnp.concatenate([seq, t], 1)
            if text_mask is None:
                text_mask = jnp.zeros((b, n_txt), bool)
            pad = jnp.concatenate(
                [jnp.zeros((b, n_img + cfg.num_det_tokens), bool),
                 text_mask.astype(bool)], 1)
        for i in range(cfg.num_layers):
            seq = _JointBlock(d, cfg.num_heads, cfg.mlp_ratio, dt,
                              name=f"block{i}")(seq, pad)
        seq = _ln("final_ln")(seq).astype(dt)
        out = {
            "img_feat": seq[:, :n_img].reshape(b, h, w, d),
            "det_tokens": seq[:, n_img:n_img + cfg.num_det_tokens],
        }
        if text_feat is not None:
            out["text_feat"] = seq[:, n_img + cfg.num_det_tokens:]
        return out


@dataclasses.dataclass(frozen=True)
class ViLTConfig:
    patch_size: int = 32
    embed_dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    vocab_size: int = 30522
    max_text_len: int = 40
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32


class ViLTEncoder(nn.Module):
    """ViLTransformerSS (VILT/vilt_module.py:129-...): single-stream
    vision-language transformer — patch embed + word embed + modality
    type embeddings, one shared block stack, CLS prepended to text."""

    cfg: ViLTConfig = ViLTConfig()

    @nn.compact
    def __call__(self, images, text_ids, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.dtype
        ps = cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (ps, ps), strides=(ps, ps),
                    padding="VALID", dtype=dt, param_dtype=jnp.float32,
                    name="patch_embed")(images.astype(dt))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        img_pos = self.param("img_pos", nn.initializers.normal(0.02),
                             (1, h * w, d), jnp.float32)
        x = x + img_pos.astype(dt)

        if text_ids.shape[1] > cfg.max_text_len:
            # HF-style truncation (the positional table has exactly
            # max_text_len+1 rows)
            text_ids = text_ids[:, :cfg.max_text_len]
            if text_mask is not None:
                text_mask = text_mask[:, :cfg.max_text_len]
        t_len = text_ids.shape[1]
        wemb = nn.Embed(cfg.vocab_size, d, dtype=dt,
                        param_dtype=jnp.float32, name="word_embed")
        t = wemb(text_ids)
        txt_pos = self.param("txt_pos", nn.initializers.normal(0.02),
                             (1, cfg.max_text_len + 1, d), jnp.float32)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, d), jnp.float32)
        t = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (b, 1, d)), t], 1)
        t = t + txt_pos[:, :t_len + 1].astype(dt)

        type_emb = self.param("type_embed", nn.initializers.normal(0.02),
                              (2, d), jnp.float32)
        x = x + type_emb[0].astype(dt)
        t = t + type_emb[1].astype(dt)

        if text_mask is None:
            text_mask = jnp.zeros((b, t_len), bool)
        # sequence layout: [img; CLS+text] — CLS never padded
        pad = jnp.concatenate(
            [jnp.zeros((b, h * w + 1), bool), text_mask.astype(bool)], 1)
        seq = jnp.concatenate([x, t], 1)
        for i in range(cfg.num_layers):
            seq = _JointBlock(d, cfg.num_heads, cfg.mlp_ratio, dt,
                              name=f"block{i}")(seq, pad)
        seq = _ln("final_ln")(seq).astype(dt)
        return {
            "img_feat": seq[:, :h * w].reshape(b, h, w, d),
            "cls_feat": seq[:, h * w],
            "text_feat": seq[:, h * w + 1:],
        }


# ---------------------------------------------------------------------------
# registry surface (reference simvg/models/builder.py VIS_ENCODERS keys)
# ---------------------------------------------------------------------------

def build_vis_enc(cfg: dict):
    """Construct a zoo encoder from a reference-style config dict:
    ``dict(type="SwinTransformer", ...)``.  MM-suffixed reference names
    alias the same architecture (the reference's MM variants differ in
    mmcv plumbing and weight-loading, not math)."""
    from simvg_tpu.models.vis_encs import (ResNetEncoder, ViTConfig,
                                           ViTEncoder)

    cfg = dict(cfg)
    typ = cfg.pop("type")
    simple = {
        "DarkNet53": DarkNet53, "DarknetMM": DarkNet53,
        "CSPDarknet": CSPDarknet,
        "ResNet": ResNetEncoder, "ResNetMM": ResNetEncoder,
    }
    if typ in simple:
        return simple[typ](**cfg)
    if typ in ("SwinTransformer", "SwinTransformerMM"):
        return SwinTransformer(SwinConfig(**cfg))
    if typ in ("PyramidVisionTransformerV2", "PyramidVisionTransformerMM",
               "PyramidVisionTransformerV2MM",
               "PyramidVisionTransformerV2MMMix"):
        return PyramidVisionTransformerV2(PVTv2Config(**cfg))
    if typ == "ConvolutionalVisionTransformerMix":
        return CvTMix(CvTMixConfig(**cfg))
    if typ == "VIT":
        return ViTEncoder(ViTConfig(**cfg))
    if typ == "VisionTransformerMix":
        return ViTMix(ViTMixConfig(**cfg))
    if typ == "VITDet":
        return ViTDet(ViTDetConfig(**cfg))
    if typ == "YOLOS":
        return YOLOSEncoder(YOLOSConfig(**cfg))
    if typ == "ViLTransformerSS":
        return ViLTEncoder(ViLTConfig(**cfg))
    raise KeyError(f"unknown vis_enc type {typ!r}")
