"""BEiT-3 task heads (the reference's vendored modeling_finetune.py).

The reference vendors unilm's BEiT3For{VisualReasoning,
ImageClassification,Captioning,VisualQuestionAnswering,Retrieval} task
heads (simvg/models/vis_encs/beit/modeling_finetune.py:57-276); none is
used by any shipped SimVG config, but they are part of the surveyed
component inventory — re-implemented here natively over
``BEiT3Encoder`` (which supports the joint, vision-only and text-only
modes plus the captioning attention mask these heads need).

Differences from the torch original, by design:
- no fairseq ``incremental_state``: greedy caption generation re-runs
  the jitted full forward per step (static shapes; the encoder is the
  cost anyway at these caption lengths);
- ``BEiT3ForVisualReasoning`` (NLVR2, two images) is expressed with
  the same joint encode run per image and a concat head.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .beit3 import BEiT3Config, BEiT3Encoder


def _ln(name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


class TwoLayerMLP(nn.Module):
    """modeling_finetune.py:18-39."""

    hidden_features: int
    out_features: int
    norm_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.norm_input:
            x = _ln("norm1")(x).astype(self.dtype)
        x = nn.Dense(self.hidden_features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="dense1")(x)
        x = _ln("norm2")(x).astype(self.dtype)
        x = jax.nn.gelu(x.astype(jnp.float32),
                        approximate=False).astype(self.dtype)
        return nn.Dense(self.out_features, dtype=self.dtype,
                        param_dtype=jnp.float32, name="dense2")(x)


class Pooler(nn.Module):
    """CLS -> LN -> dense -> tanh (modeling_finetune.py:42-54)."""

    output_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cls_rep):
        x = _ln("norm")(cls_rep).astype(self.dtype)
        x = nn.Dense(self.output_features, dtype=self.dtype,
                     param_dtype=jnp.float32, name="dense")(x)
        return jnp.tanh(x.astype(jnp.float32)).astype(self.dtype)


class BEiT3ForImageClassification(nn.Module):
    """Mean of patch tokens -> LN -> linear
    (modeling_finetune.py:106-131)."""

    cfg: BEiT3Config
    num_classes: int

    @nn.compact
    def __call__(self, image, deterministic: bool = True):
        img_feat, _, _ = BEiT3Encoder(self.cfg, name="beit3")(
            images=image, deterministic=deterministic)
        x = _ln("fc_norm")(img_feat.mean(axis=1))
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head")(x)


class BEiT3ForVisualQuestionAnswering(nn.Module):
    """Joint encode -> Pooler(CLS) -> 2-layer head
    (modeling_finetune.py:191-223)."""

    cfg: BEiT3Config
    num_classes: int

    @nn.compact
    def __call__(self, image, question_ids, padding_mask,
                 deterministic: bool = True):
        _, _, cls_feat = BEiT3Encoder(self.cfg, name="beit3")(
            images=image, text_ids=question_ids,
            text_padding_mask=padding_mask,
            deterministic=deterministic)
        pooled = Pooler(self.cfg.embed_dim, dtype=self.cfg.dtype,
                        name="pooler")(cls_feat)
        h = nn.Dense(self.cfg.embed_dim * 2, dtype=self.cfg.dtype,
                     param_dtype=jnp.float32, name="head_dense1")(pooled)
        h = _ln("head_norm")(h).astype(self.cfg.dtype)
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(self.cfg.dtype)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="head_dense2")(h)


class BEiT3ForVisualReasoning(nn.Module):
    """NLVR2: encode (image_a, text) and (image_b, text), concat CLS
    reps -> TwoLayerMLP (modeling_finetune.py:57-103)."""

    cfg: BEiT3Config
    num_classes: int = 2

    @nn.compact
    def __call__(self, image_a, image_b, text_ids, padding_mask,
                 deterministic: bool = True):
        enc = BEiT3Encoder(self.cfg, name="beit3")
        _, _, cls_a = enc(images=image_a, text_ids=text_ids,
                          text_padding_mask=padding_mask,
                          deterministic=deterministic)
        _, _, cls_b = enc(images=image_b, text_ids=text_ids,
                          text_padding_mask=padding_mask,
                          deterministic=deterministic)
        x = jnp.concatenate([cls_a, cls_b], axis=-1)
        return TwoLayerMLP(self.cfg.embed_dim * 2, self.num_classes,
                           dtype=self.cfg.dtype, name="head")(x)


class BEiT3ForRetrieval(nn.Module):
    """Single-modality encodes -> normalized CLS heads + logit scale
    (modeling_finetune.py:226-276).  Returns (vision_cls, language_cls,
    logit_scale); the CLIP-style contrastive loss lives with the
    trainer (cross-device logits via the mesh's data axis)."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, image=None, text_ids=None, padding_mask=None,
                 deterministic: bool = True):
        enc = BEiT3Encoder(self.cfg, name="beit3")
        logit_scale = self.param(
            "logit_scale",
            lambda *_: jnp.asarray(jnp.log(1.0 / 0.07), jnp.float32), ())
        vision_cls = language_cls = None
        if image is not None:
            _, _, cls_feat = enc(images=image,
                                 deterministic=deterministic)
            v = nn.Dense(self.cfg.embed_dim, use_bias=False,
                         dtype=self.cfg.dtype, param_dtype=jnp.float32,
                         name="vision_head")(cls_feat)
            vision_cls = v / jnp.linalg.norm(
                v.astype(jnp.float32), axis=-1, keepdims=True)
        if text_ids is not None:
            _, text_feat, _ = enc(text_ids=text_ids,
                                  text_padding_mask=padding_mask,
                                  deterministic=deterministic)
            t = nn.Dense(self.cfg.embed_dim, use_bias=False,
                         dtype=self.cfg.dtype, param_dtype=jnp.float32,
                         name="language_head")(text_feat[:, 0, :])
            language_cls = t / jnp.linalg.norm(
                t.astype(jnp.float32), axis=-1, keepdims=True)
        return vision_cls, language_cls, logit_scale


def captioning_uni_mask(image_len: int, text_len: int) -> jnp.ndarray:
    """Additive [S, S] attention mask (modeling_finetune.py:148-158):
    image<->image full, caption->image full, caption->caption causal;
    image->caption blocked.  0 where allowed, -inf where masked."""
    s = image_len + text_len
    allowed = jnp.zeros((s, s), bool)
    allowed = allowed.at[:image_len, :image_len].set(True)
    allowed = allowed.at[image_len:, :image_len].set(True)
    tri = jnp.tril(jnp.ones((text_len, text_len), bool))
    allowed = allowed.at[image_len:, image_len:].set(tri)
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)


class BEiT3ForCaptioning(nn.Module):
    """Uni-masked joint encode -> MLM head over text positions
    (modeling_finetune.py:133-188)."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, image, text_ids, padding_mask,
                 deterministic: bool = True):
        cfg = self.cfg
        bias = captioning_uni_mask(cfg.seq_vision, text_ids.shape[1])
        _, text_feat, _ = BEiT3Encoder(cfg, name="beit3")(
            images=image, text_ids=text_ids,
            text_padding_mask=padding_mask,
            deterministic=deterministic, attn_bias=bias)
        return nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        name="mlm_head")(text_feat)

    @staticmethod
    def greedy_generate(model, params, image, bos_id: int, eos_id: int,
                        max_len: int = 20, pad_id: int = 1):
        """Greedy caption decode by re-running the jitted full forward
        per step (static shapes; no fairseq incremental_state)."""
        b = image.shape[0]
        ids = jnp.full((b, max_len), pad_id, jnp.int32)
        ids = ids.at[:, 0].set(bos_id)
        mask = jnp.ones((b, max_len), jnp.int32).at[:, 0].set(0)
        step = jax.jit(lambda p, im, i, m: model.apply(
            p, image=im, text_ids=i, padding_mask=m))
        done = jnp.zeros((b,), bool)
        for t in range(1, max_len):
            logits = step(params, image, ids, mask)
            nxt = jnp.argmax(logits[:, t - 1, :], axis=-1).astype(
                jnp.int32)
            nxt = jnp.where(done, pad_id, nxt)
            ids = ids.at[:, t].set(nxt)
            mask = mask.at[:, t].set(jnp.where(done, 1, 0))
            done = done | (nxt == eos_id)
        return ids
