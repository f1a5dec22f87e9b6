"""BEiT-3 multiway multimodal encoder, TPU-first.

Re-designed from the reference's vendored torchscale stack
(simvg/models/vis_encs/beit/beit3_base.py:35-488, modeling_utils.py:21-109,
beit3.py:29-185) as a functional flax module:

- The reference's stateful ``set_split_position`` mutation
  (beit3_base.py:127-130) becomes a *static* split index: the joint
  sequence is always ``[CLS] + image patches + text tokens``, so every
  "multiway" module is two parameter sets (``A`` = vision, ``B`` = text).
  The two segments are carried as SEPARATE arrays through the whole
  layer stack and only concatenated where the math requires the joint
  sequence (the attention q/k/v); this removes ~6 concatenates and ~18
  slices of the [B, S, D] activation per layer vs the naive
  concat-slice-per-module dataflow (measured ~6% of the forward pass).
- Attention runs over the concatenated sequence with a key-padding mask
  for padded text positions; softmax is computed in float32 (parity with
  torchscale's fp32 softmax), everything else in a configurable compute
  dtype (bfloat16 on TPU so matmuls hit the MXU natively).
- Fairseq position offset (+2, beit3_base.py:425-428) and the
  post-embedding zeroing of padded positions (beit3_base.py:367) are
  preserved exactly for checkpoint parity.

Config hyperparameters follow ``_get_base_config`` / ``_get_large_config``
(modeling_utils.py:21-70) with torchscale ``EncoderConfig`` defaults:
pre-LN, subln (inner attention LN + FFN LN), no embed scaling, no
layernorm_embedding, multiway, normalize_output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from simvg_tpu.ops.attention import multihead_attention
from simvg_tpu.ops.gelu import fast_gelu


@dataclasses.dataclass(frozen=True)
class BEiT3Config:
    img_size: int = 640
    patch_size: int = 32
    in_chans: int = 3
    vocab_size: int = 64010
    embed_dim: int = 768
    num_heads: int = 12
    ffn_dim: int = 3072
    num_layers: int = 12
    max_source_positions: int = 1024
    drop_path_rate: float = 0.1
    dropout: float = 0.0
    attention_dropout: float = 0.0
    layernorm_eps: float = 1e-5
    dtype: Any = jnp.float32  # compute dtype; params are always fp32
    attn_impl: str = "xla"  # "xla" | "pallas" (fused kernel)
    gelu_impl: str = "auto"  # "exact" (XLA erf; bit-parity with torch in
    # fp32) | "fast" (tanh-form erf, max abs err 1.8e-6 — see
    # ops/gelu.py) | "auto": exact when dtype is fp32, fast otherwise.
    remat: bool = False  # rematerialise encoder layers (activation
    # checkpointing; trades FLOPs for HBM like the reference's
    # checkpoint_activations flag, beit3_base.py:311-312)
    remat_policy: str = "full"  # "full": save only layer inputs (the
    # default — measured FASTER than selective saving on v5e: 198 vs
    # 190 img/s at bs=32, because re-reading the saved matmul outputs
    # from HBM costs more than recomputing them). "dots": save the
    # parameter-matmul outputs (jax dots_with_no_batch_dims_saveable,
    # ~175 MB/layer at bs=32) and recompute only elementwise/LN/
    # attention-prob work — useful when backward-compute-bound.
    quant: str = "none"  # "none" | "int8" | "int8_calib" |
    # "int8_static" | "int8_qat": w8a8 quantization of the encoder's
    # parameter matmuls (q/k/v/out + FFN) on the MXU's 2x int8 path —
    # same param layout, so converted checkpoints load unchanged.
    # "int8" quantizes dynamically each forward; "int8_calib" records
    # activation maxima (mutable "quant" collection); "int8_static"
    # serves from pre-quantized weights + calibrated activation scales
    # (ops/quant.py build_quant_collection).  All three are
    # serving-only (training refuses them).  "int8_qat" is the
    # TRAINING mode: fake-quant forward + straight-through-estimator
    # backward, so a checkpoint fine-tuned under it serves accurately
    # with int8_static.
    scan_layers: bool = False  # lax.scan over the identical encoder
    # layers: ONE layer body in the compiled program instead of
    # num_layers copies — an order of magnitude smaller HLO, much
    # faster compiles (critical for remote-compiled environments).
    # Parameters become stacked [L, ...]; see
    # tools/convert_checkpoint.stack_scan_layers.
    token_prune_keep: Optional[int] = None  # serving-only perf lever
    # (EViT / attention-aware token filtering, arXiv 2202.07800 /
    # 2506.01519): after layer ``token_prune_layer``, keep only the
    # top-K vision PATCH tokens ranked by the CLS token's attention
    # (mean over heads); CLS and the text segment are never pruned.
    # Shrinks the joint sequence for the remaining layers — a NEW axis
    # above the S=421 bandwidth floor (ROADMAP "Perf analysis").
    # Token-branch serving ONLY: the surviving tokens no longer form
    # the [H/ps, W/ps] grid the decoder branch needs
    # (SimVGModel enforces branches="token").  No new parameters, so
    # converted checkpoints load unchanged; accuracy impact must be
    # validated on real weights before production use.
    token_prune_layer: int = 4  # prune after this many layers have run
    token_prune_force: bool = False  # bypass the measured accuracy
    # envelope (prune depth >= num_layers/3, keep >= 75% of patch
    # tokens — ROADMAP "Token pruning").  Outside-envelope configs
    # raise unless this is set; perf-lever measurements (bench.py) and
    # deliberately-validated deployments set it explicitly.
    seq_parallel: bool = False  # Megatron-style sequence parallelism
    # on top of tensor parallelism: the residual stream between the
    # TP-sharded matmul blocks is sharded over the "model" mesh axis
    # along the SEQUENCE dim (with_sharding_constraint P(data, model,
    # None)), so LayerNorm / residual adds / drop-path compute on
    # S/mp tokens per chip instead of redundantly on all S, and GSPMD
    # turns the TP block-boundary all-reduce into reduce-scatter +
    # all-gather (same bytes, less elementwise HBM traffic).  Requires
    # tracing under a mesh context (``with mesh:``) whose axes are
    # ("data", "model"); a no-op when model_parallel == 1.

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def seq_vision(self) -> int:
        """CLS + patch tokens = the multiway split position."""
        return self.num_patches + 1

    @classmethod
    def base(cls, **kw) -> "BEiT3Config":
        """modeling_utils.py:21-44 hyperparameters."""
        return cls(embed_dim=768, num_heads=12, ffn_dim=3072, num_layers=12,
                   **kw)

    @classmethod
    def large(cls, **kw) -> "BEiT3Config":
        """modeling_utils.py:47-70 hyperparameters."""
        return cls(embed_dim=1024, num_heads=16, ffn_dim=4096, num_layers=24,
                   **kw)


def _seq_shard(cfg: BEiT3Config, xs):
    """Sequence-parallel constraint on the (vision, text) residual
    pair: [B, S, D] sharded P(data, model, None) so the elementwise
    zones between TP matmul blocks run on S/mp tokens per chip.  GSPMD
    handles uneven S (421 % mp != 0) by internal padding.  Requires an
    ambient mesh with ("data", "model") axes at trace time."""
    if not cfg.seq_parallel:
        return xs
    if not any(isinstance(h, jax.core.Tracer) for h in xs):
        # eager execution (model.init): the eager constraint path
        # REQUIRES divisibility (S % mp == 0), while the jit/GSPMD
        # path pads internally — and S = num_patches + 1 is odd for
        # square grids.  Placement only matters inside the compiled
        # step, so skip it eagerly.
        return xs
    from jax.sharding import PartitionSpec as P

    spec = P("data", "model", None)
    return tuple(
        jax.lax.with_sharding_constraint(h, spec)
        if h.shape[1] % 2 == 0 else h
        for h in xs)


def _dense(cfg: BEiT3Config, features: int, name: str) -> nn.Module:
    init = nn.initializers.truncated_normal(0.02, lower=-2.0, upper=2.0)
    if cfg.quant.startswith("int8"):
        from simvg_tpu.ops.quant import Int8Dense

        mode = {"int8": "dynamic", "int8_calib": "calib",
                "int8_static": "static", "int8_qat": "qat"}[cfg.quant]
        return Int8Dense(features, dtype=cfg.dtype, kernel_init=init,
                         mode=mode, name=name)
    return nn.Dense(
        features,
        dtype=cfg.dtype,
        param_dtype=jnp.float32,
        kernel_init=init,
        name=name,
    )


def _ln(cfg: BEiT3Config, name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _gelu_fn(cfg: BEiT3Config):
    """Exact-GELU (erf form) activation; see BEiT3Config.gelu_impl."""
    exact = cfg.gelu_impl == "exact" or (
        cfg.gelu_impl == "auto" and cfg.dtype == jnp.float32
    )
    if exact:
        return lambda h: jax.nn.gelu(
            h.astype(jnp.float32), approximate=False
        ).astype(cfg.dtype)
    return lambda h: fast_gelu(h).astype(cfg.dtype)


class MultiwayFFN(nn.Module):
    """FeedForwardNetwork with subln (torchscale feedforward_network.py):
    fc1 -> gelu(exact) -> ffn_layernorm -> fc2, one parameter set per
    modality.  Takes/returns the (vision, text) segment pair."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, xs):
        cfg = self.cfg
        gelu = _gelu_fn(cfg)

        def one_way(tag):
            fc1 = _dense(cfg, cfg.ffn_dim, f"fc1_{tag}")
            fc2 = _dense(cfg, cfg.embed_dim, f"fc2_{tag}")
            ffn_ln = _ln(cfg, f"ffn_layernorm_{tag}")

            def f(h):
                h = ffn_ln(gelu(fc1(h))).astype(cfg.dtype)
                return fc2(h)

            return f

        return one_way("A")(xs[0]), one_way("B")(xs[1])


class MultiwayAttention(nn.Module):
    """torchscale MultiheadAttention with multiway q/k/v/out projections
    and subln inner LayerNorm (multihead_attention.py in torchscale;
    instantiated at beit3_base.py:112-121).

    Takes/returns the (vision, text) segment pair; the joint sequence
    exists only for the attention core itself (q/k/v concatenated once,
    output split once).

    ``return_cls_attn``: additionally return the CLS query's attention
    distribution over the joint sequence (mean over heads, fp32
    [B, S]) — the token-pruning score (BEiT3Config.token_prune_keep)."""

    cfg: BEiT3Config
    return_cls_attn: bool = False

    @nn.compact
    def __call__(
        self,
        xs,
        key_padding_mask: Optional[jnp.ndarray],
        deterministic: bool,
        attn_bias: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        split = xs[0].shape[1]

        def proj(tag):
            a = _dense(cfg, cfg.embed_dim, f"{tag}_proj_A")
            b = _dense(cfg, cfg.embed_dim, f"{tag}_proj_B")
            return lambda hs: jnp.concatenate([a(hs[0]), b(hs[1])], axis=1)

        q = proj("q")(xs)
        k = proj("k")(xs)
        v = proj("v")(xs)

        out = multihead_attention(
            q, k, v,
            num_heads=cfg.num_heads,
            key_padding_mask=key_padding_mask,
            # additive [S,S] mask (captioning's uni-directional mask,
            # modeling_finetune.py:148-158); the fused kernel has no
            # bias path, so multihead_attention falls back to XLA
            attn_bias=attn_bias,
            dropout_rate=cfg.attention_dropout,
            deterministic=deterministic,
            dropout_rng=None if deterministic or cfg.attention_dropout == 0.0
            else self.make_rng("dropout"),
            dtype=cfg.dtype,
            # the fused kernel has no prob-dropout path; fall back to XLA
            # when attention dropout is active (it is 0.0 in every
            # shipped config).  return_weights forces the XLA path too
            # (the fused kernel never materializes probs).
            impl=cfg.attn_impl
            if deterministic or cfg.attention_dropout == 0.0 else "xla",
            return_weights=self.return_cls_attn,
        )
        cls_attn = None
        if self.return_cls_attn:
            out, probs = out  # probs [B, H, S_q, S_k]
            cls_attn = probs[:, :, 0, :].astype(jnp.float32).mean(axis=1)
        o_vis, o_txt = out[:, :split], out[:, split:]

        inner_a = _ln(cfg, "inner_attn_ln_A")
        inner_b = _ln(cfg, "inner_attn_ln_B")
        out_a = _dense(cfg, cfg.embed_dim, "out_proj_A")
        out_b = _dense(cfg, cfg.embed_dim, "out_proj_B")
        outs = (out_a(inner_a(o_vis).astype(cfg.dtype)),
                out_b(inner_b(o_txt).astype(cfg.dtype)))
        if self.return_cls_attn:
            return outs, cls_attn
        return outs


class DropPath(nn.Module):
    """Per-sample stochastic depth on a residual branch (torchscale
    DropPath, enabled with linspace(0, drop_path_rate, L) at
    beit3_base.py:44-48).

    Operates on the (vision, text) segment pair with ONE per-sample
    mask applied to both segments — matching the reference, where the
    mask is drawn for the whole joint-sequence residual."""

    rate: float

    @nn.compact
    def __call__(self, xs, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return xs
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(
            rng, keep, (xs[0].shape[0], 1, 1)
        ).astype(xs[0].dtype)
        return tuple(x / keep * mask for x in xs)


class EncoderLayer(nn.Module):
    """Pre-LN multiway transformer block (beit3_base.py:127-172).
    Takes/returns the (vision, text) segment pair.  With
    ``return_cls_attn`` also returns the CLS attention row (the
    token-pruning score) — parameters are identical either way."""

    cfg: BEiT3Config
    drop_path_rate: float
    return_cls_attn: bool = False

    @nn.compact
    def __call__(self, xs, key_padding_mask, deterministic,
                 attn_bias=None):
        cfg = self.cfg
        ln1_a = _ln(cfg, "self_attn_layer_norm_A")
        ln1_b = _ln(cfg, "self_attn_layer_norm_B")
        ln2_a = _ln(cfg, "final_layer_norm_A")
        ln2_b = _ln(cfg, "final_layer_norm_B")
        drop_path = DropPath(self.drop_path_rate, name="drop_path")

        hs = (ln1_a(xs[0]).astype(cfg.dtype), ln1_b(xs[1]).astype(cfg.dtype))
        hs = MultiwayAttention(cfg, return_cls_attn=self.return_cls_attn,
                               name="self_attn")(
            hs, key_padding_mask, deterministic, attn_bias
        )
        cls_attn = None
        if self.return_cls_attn:
            hs, cls_attn = hs
        hs = drop_path(hs, deterministic)
        xs = _seq_shard(cfg, (xs[0] + hs[0], xs[1] + hs[1]))

        hs = (ln2_a(xs[0]).astype(cfg.dtype), ln2_b(xs[1]).astype(cfg.dtype))
        hs = MultiwayFFN(cfg, name="ffn")(hs)
        hs = drop_path(hs, deterministic)
        out = _seq_shard(cfg, (xs[0] + hs[0], xs[1] + hs[1]))
        if self.return_cls_attn:
            return out, cls_attn
        return out


class _ScanLayerBody(nn.Module):
    """EncoderLayer variant for nn.scan: drop-path rate arrives as a
    traced per-layer input; deterministic is a static attr."""

    cfg: BEiT3Config
    deterministic: bool

    @nn.compact
    def __call__(self, xs, key_padding_mask, dp_rate, attn_bias=None):
        cfg = self.cfg
        det = self.deterministic
        ln1_a = _ln(cfg, "self_attn_layer_norm_A")
        ln1_b = _ln(cfg, "self_attn_layer_norm_B")
        ln2_a = _ln(cfg, "final_layer_norm_A")
        ln2_b = _ln(cfg, "final_layer_norm_B")

        def drop_path(hs):
            if det or cfg.drop_path_rate == 0.0:
                return hs
            keep = 1.0 - dp_rate
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(
                rng, keep, (hs[0].shape[0], 1, 1)
            ).astype(hs[0].dtype)
            return tuple(h / keep * mask for h in hs)

        hs = (ln1_a(xs[0]).astype(cfg.dtype), ln1_b(xs[1]).astype(cfg.dtype))
        hs = MultiwayAttention(cfg, name="self_attn")(
            hs, key_padding_mask, det, attn_bias
        )
        hs = drop_path(hs)
        xs = _seq_shard(cfg, (xs[0] + hs[0], xs[1] + hs[1]))

        hs = (ln2_a(xs[0]).astype(cfg.dtype), ln2_b(xs[1]).astype(cfg.dtype))
        hs = MultiwayFFN(cfg, name="ffn")(hs)
        hs = drop_path(hs)
        # scan requires a dtype-stable carry
        return _seq_shard(cfg, ((xs[0] + hs[0]).astype(cfg.dtype),
                                (xs[1] + hs[1]).astype(cfg.dtype))), None


class VisionEmbedding(nn.Module):
    """Conv patchify + CLS prepend (torchscale VisionEmbedding,
    used at beit3_base.py:417-424). Input is NHWC.

    (An unfold+matmul formulation was benchmarked and rejected: the
    matmul itself is 5x faster than XLA's conv emitter here, but the
    required [B,gh,ps,gw,ps,c]->[B,gh,gw,ps,ps,c] relayout of the full
    image costs more than the difference.)"""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="proj",
        )(images.astype(cfg.dtype))
        b, h, w, d = x.shape
        x = x.reshape(b, h * w, d)
        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, d),
            jnp.float32
        )
        # mask_token exists in BEiT-3 checkpoints (contain_mask_token=True)
        # but is never used for REC; kept for converter completeness.
        self.param("mask_token", nn.initializers.zeros, (1, 1, d),
                   jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(cfg.dtype), (b, 1, d))
        return jnp.concatenate([cls, x], axis=1)


class BEiT3Encoder(nn.Module):
    """The joint vision-language encoder.

    __call__(images NHWC, text_ids [B,T], text_padding_mask [B,T] with
    1 = padded) -> (img_feat [B,P,D], text_feat [B,T,D], cls_feat [B,D]),
    the same contract as the reference's ``BEIT3.forward``
    (simvg/models/vis_encs/beit/beit3.py:176-185).
    """

    cfg: BEiT3Config

    @nn.compact
    def __call__(
        self,
        images: Optional[jnp.ndarray] = None,
        text_ids: Optional[jnp.ndarray] = None,
        text_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        attn_bias: Optional[jnp.ndarray] = None,
        return_prune_idx: bool = False,
    ):
        """Joint (default), vision-only (``text_ids=None``) or text-only
        (``images=None``) encode — the single-modality modes serve the
        BEiT-3 task heads (retrieval/classification,
        modeling_finetune.py:126-131, 244-276) and run the same layers
        with an EMPTY other segment (0-length arrays are free under
        XLA).  ``attn_bias``: optional additive [S,S] mask (captioning's
        uni-directional mask).  Returns (img_feat, text_feat, cls_feat);
        the absent modality's outputs are None.
        ``return_prune_idx``: also return the [B, K] original-grid
        indices of the patch tokens kept by token pruning (None when
        token_prune_keep is off) — the caller needs them to gather the
        matching rows of its spatial padding mask."""
        cfg = self.cfg
        assert images is not None or text_ids is not None
        if not deterministic and not self.is_initializing():
            # encoder-level guard (ADVICE r3): SimVGModel refuses the
            # serving-only quant modes in training, but the task heads
            # (beit3_heads.py) and direct-encoder users reach here
            # without that wrapper — int8 rounding has no gradient, so
            # training with a serving mode silently kills encoder
            # gradients.  int8_qat (fake-quant + STE) is the training
            # mode.
            # ValueError, not assert: the failure this guards is silent
            # gradient death, so it must survive `python -O`.
            if cfg.quant not in ("none", "int8_qat"):
                raise ValueError(
                    f"quant={cfg.quant!r} is serving-only; train with "
                    "quant='int8_qat' (STE) and serve with int8_static")
        split = cfg.seq_vision if images is not None else 0

        if images is not None:
            x_vis = VisionEmbedding(cfg, name="vision_embed")(images)
            assert x_vis.shape[1] == split, (x_vis.shape, split)
            b = x_vis.shape[0]
            # Fairseq-compatible learned positions, offset by +2
            # (beit3_base.py:425-432 + torchscale PositionalEmbedding
            # default positions = arange(2, L+2)).
            vis_pos_table = nn.Embed(
                split + 2, cfg.embed_dim, dtype=cfg.dtype,
                param_dtype=jnp.float32, name="vision_pos_embed",
            )
            x_vis = x_vis + vis_pos_table(jnp.arange(2, split + 2))
        else:
            b = text_ids.shape[0]
            x_vis = jnp.zeros((b, 0, cfg.embed_dim), cfg.dtype)

        if text_ids is not None:
            text_embed = nn.Embed(
                cfg.vocab_size,
                cfg.embed_dim,
                dtype=cfg.dtype,
                param_dtype=jnp.float32,
                embedding_init=nn.initializers.normal(
                    cfg.embed_dim ** -0.5),
                name="text_embed",
            )
            x_txt = text_embed(text_ids)
            txt_pos_table = nn.Embed(
                cfg.max_source_positions, cfg.embed_dim, dtype=cfg.dtype,
                param_dtype=jnp.float32, name="text_pos_embed",
            )
            t_txt = x_txt.shape[1]
            x_txt = x_txt + txt_pos_table(jnp.arange(2, t_txt + 2))
            if text_padding_mask is None:
                text_padding_mask = jnp.zeros((b, t_txt), jnp.int32)
            pad_txt = text_padding_mask.astype(bool)
            # Zero embeddings at padded positions (beit3_base.py:367);
            # vision positions are never padded.
            x_txt = x_txt * (1.0 - pad_txt.astype(x_txt.dtype))[..., None]
        else:
            x_txt = jnp.zeros((b, 0, cfg.embed_dim), cfg.dtype)
            pad_txt = jnp.zeros((b, 0), bool)

        # key-padding mask over the joint sequence, for attention
        pad = jnp.concatenate(
            [jnp.zeros((b, split), bool), pad_txt], axis=1
        )

        xs = (x_vis.astype(cfg.dtype), x_txt.astype(cfg.dtype))
        if cfg.token_prune_keep is not None:
            assert not cfg.scan_layers, \
                "token_prune_keep requires scan_layers=False (the " \
                "sequence length changes mid-stack)"
        remat_kw = {}
        if cfg.remat and cfg.remat_policy == "dots":
            remat_kw["policy"] = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )
        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.num_layers)
        if cfg.scan_layers:
            body = _ScanLayerBody
            if cfg.remat:
                # prevent_cse=False: unnecessary under scan/while (flax
                # docs) and avoids CSE-barrier overhead in the loop body
                body = nn.remat(body, static_argnums=(),
                                prevent_cse=False, **remat_kw)
            # the per-layer "quant" collection (int8_static/calib
            # modes) is stacked along the scan axis like params
            var_axes = {"params": 0}
            if cfg.quant in ("int8_static", "int8_calib"):
                var_axes["quant"] = 0
            if attn_bias is None:
                scan = nn.scan(
                    body,
                    variable_axes=var_axes,
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, 0),
                    length=cfg.num_layers,
                )
                xs, _ = scan(cfg, deterministic, name="layers")(
                    xs, pad, jnp.asarray(dpr, jnp.float32)
                )
            else:
                scan = nn.scan(
                    body,
                    variable_axes=var_axes,
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, 0, nn.broadcast),
                    length=cfg.num_layers,
                )
                xs, _ = scan(cfg, deterministic, name="layers")(
                    xs, pad, jnp.asarray(dpr, jnp.float32), attn_bias
                )
        else:
            layer_cls = (
                nn.remat(EncoderLayer, static_argnums=(3,), **remat_kw)
                if cfg.remat else EncoderLayer
            )
            prune_keep = cfg.token_prune_keep
            prune_layer = -1
            if prune_keep is not None:
                # static-shape vision-token pruning (see BEiT3Config):
                # only meaningful on a joint/vision encode with patch
                # tokens to drop, and incompatible with a [S,S] bias
                # whose S would change mid-stack
                assert split > 1, "token_prune_keep needs vision input"
                assert attn_bias is None, \
                    "token_prune_keep is incompatible with attn_bias"
                assert 0 < prune_keep < split, (prune_keep, split)
                # the last prunable layer is L-2 (at least one layer
                # must run on the pruned sequence).  Only the
                # dataclass DEFAULT (4) is clamped for shallow models;
                # an explicitly out-of-range value is an error, not a
                # silent move of the prune point.
                prune_layer = cfg.token_prune_layer
                if prune_layer > cfg.num_layers - 2:
                    if prune_layer == 4:  # the default on a shallow model
                        prune_layer = cfg.num_layers - 2
                    else:
                        raise ValueError(
                            f"token_prune_layer={prune_layer} out of "
                            f"range for num_layers={cfg.num_layers} "
                            f"(last prunable layer is "
                            f"{cfg.num_layers - 2})")
                assert prune_layer >= 0, (cfg.token_prune_layer,
                                          cfg.num_layers)
                if not cfg.token_prune_force:
                    # Measured accuracy envelope (ROADMAP "Token
                    # pruning": shallow/coarse pruning collapses the
                    # token branch; mid-stack keep>=75% measured
                    # zero-loss).  Refuse configurations outside it
                    # unless explicitly forced — a silent accuracy
                    # cliff must not be one config key away
                    # (VERDICT r3 #3).
                    min_layer = max(1, round(cfg.num_layers / 3))
                    min_keep = int(np.ceil(0.75 * (split - 1)))
                    if prune_layer < min_layer or prune_keep < min_keep:
                        raise ValueError(
                            f"token_prune_keep={prune_keep} at "
                            f"token_prune_layer={prune_layer} is outside "
                            f"the measured-safe envelope (prune at layer "
                            f">= {min_layer} = num_layers/3 and keep >= "
                            f"{min_keep} = 75% of {split - 1} patch "
                            f"tokens — ROADMAP 'Token pruning').  Set "
                            f"token_prune_force=True to run anyway "
                            f"(validate accuracy on real weights first).")
            prune_idx = None
            for i in range(cfg.num_layers):
                want_attn = (prune_keep is not None
                             and i == prune_layer)
                layer = layer_cls(cfg, drop_path_rate=float(dpr[i]),
                                  return_cls_attn=want_attn,
                                  name=f"layers_{i}")
                if want_attn:
                    xs, cls_attn = layer(xs, pad, deterministic,
                                         attn_bias)
                    # rank PATCH tokens by the CLS query's attention
                    # (positions 1..split-1 of the joint row); keep the
                    # top-K in spatial order — a static-shape gather
                    scores = cls_attn[:, 1:split]
                    idx = jax.lax.top_k(scores, prune_keep)[1]
                    idx = jnp.sort(idx, axis=1)
                    prune_idx = idx
                    patches = jnp.take_along_axis(
                        xs[0][:, 1:], idx[..., None], axis=1)
                    xs = (jnp.concatenate([xs[0][:, :1], patches],
                                          axis=1), xs[1])
                    split = 1 + prune_keep
                    pad = jnp.concatenate(
                        [jnp.zeros((b, split), bool), pad_txt], axis=1)
                else:
                    xs = layer(xs, pad, deterministic, attn_bias)

        # normalize_output=True -> final multiway LayerNorm
        # (beit3_base.py:227-230).
        img_feat = text_feat = cls_feat = None
        if split:
            x_vis = _ln(cfg, "layer_norm_A")(xs[0])
            cls_feat = x_vis[:, 0]
            img_feat = x_vis[:, 1:]
        if text_ids is not None:
            text_feat = _ln(cfg, "layer_norm_B")(xs[1])
        if return_prune_idx:
            return img_feat, text_feat, cls_feat, (
                prune_idx if cfg.token_prune_keep is not None else None)
        return img_feat, text_feat, cls_feat
