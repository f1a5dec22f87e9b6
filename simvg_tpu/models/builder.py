"""Model construction from reference-style config dicts.

Accepts the same ``model = dict(type="MIXDETRMB", vis_enc=..., head=...)``
key surface as the reference configs (configs/single/ViT-base/refcoco/
refcoco_onestage.py:68-105; builders at simvg/models/builder.py:1-36) and
produces the flax SimVGModel plus the loss-orchestration settings the
train step needs.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from .beit3 import BEiT3Config
from .heads.tgqs_head import TGQSHeadConfig
from .model import SimVGConfig, SimVGModel


def build_composed_model(model_cfg: Dict[str, Any], *,
                         dtype=jnp.float32):
    """SeqTR-style composition (reference OneStageModel,
    simvg/models/det_seg/one_stage.py:6-25): separate vis_enc (zoo) +
    lan_enc + fusion + plain DETR head, each built from its
    reference-style config dict.  Returns (model, loss_cfg)."""
    from .fusion import ComposedOneStageModel, CrossAttentionFusion
    from .heads.simple_head import DETRHead, DETRHeadConfig
    from .lan_encs import BERTLanguageEncoder, LSTMLanguageEncoder
    from .vis_enc_zoo import build_vis_enc

    ve = dict(model_cfg.get("vis_enc") or {})
    le = dict(model_cfg.get("lan_enc") or {})
    fu = dict(model_cfg.get("fusion") or {})
    hd = dict(model_cfg.get("head") or {})

    # trainer-level keys consumed by loss_cfg below, not the encoder
    ve_ctor = {k: v for k, v in ve.items()
               if k not in ("freeze_layer", "pretrain")}
    vis_enc = build_vis_enc(ve_ctor)

    lan_type = le.pop("type", "LSTM")
    if lan_type in ("LSTM", "RNN"):
        le.setdefault("output_type", "original")
        lan_enc = LSTMLanguageEncoder(**le)
    elif lan_type == "ALBERTA":
        lan_enc = BERTLanguageEncoder(**le)
    else:
        raise KeyError(f"unknown lan_enc type {lan_type!r}")

    fu.pop("type", None)
    fusion = CrossAttentionFusion(**fu)

    hd.pop("type", None)
    loss_keys = ("branch_loss_weight", "prepare_target_mode",
                 "distill_type", "mlp_aux_loss", "as_target_query_thr")
    loss_cfg = {k: hd.pop(k) for k in loss_keys if k in hd}
    head = DETRHead(DETRHeadConfig(**hd))

    model = ComposedOneStageModel(vis_enc=vis_enc, lan_enc=lan_enc,
                                  fusion=fusion, head=head)
    loss_cfg.setdefault("branch_loss_weight", {"decoder": 1.0})
    loss_cfg["freeze_layer"] = ve.get("freeze_layer", -1)
    loss_cfg["pretrain"] = ve.get("pretrain", None)
    return model, loss_cfg


def build_model(model_cfg: Dict[str, Any], *, img_size: int = 640,
                dtype=jnp.float32) -> Tuple[SimVGModel, Dict[str, Any]]:
    """Returns (model, loss_cfg)."""
    if model_cfg.get("type") == "OneStageModel":
        return build_composed_model(model_cfg, dtype=dtype)
    assert model_cfg.get("type", "MIXDETRMB") in ("MIXDETRMB",), (
        model_cfg.get("type")
    )
    ve = dict(model_cfg.get("vis_enc", {}))
    head = dict(model_cfg.get("head", {}))

    vit_type = ve.get("vit_type", "base")
    common = dict(
        img_size=ve.get("img_size", img_size),
        patch_size=ve.get("patch_size", 32),
        vocab_size=ve.get("vocab_size", 64010),
        drop_path_rate=ve.get("drop_path_rate", 0.1),
        dtype=dtype,
        attn_impl=ve.get("attn_impl", "xla"),
        gelu_impl=ve.get("gelu_impl", "auto"),
        remat_policy=ve.get("remat_policy", "full"),
        dropout=ve.get("dropout", 0.0),
        attention_dropout=ve.get("attention_dropout", 0.0),
        remat=ve.get("remat", ve.get("checkpoint_activations", False)
                     or False),
        scan_layers=ve.get("scan_layers", False),
        # quantization (ops/quant.py): "none" | "int8" | "int8_calib"
        # | "int8_static" (serving) | "int8_qat" (QAT training)
        quant=ve.get("quant", "none"),
        # token-branch serving lever: keep top-K vision tokens by CLS
        # attention after token_prune_layer (BEiT3Config)
        token_prune_keep=ve.get("token_prune_keep", None),
        token_prune_layer=ve.get("token_prune_layer", 4),
        token_prune_force=ve.get("token_prune_force", False),
        # Megatron-style sequence parallelism between the TP matmul
        # blocks (needs model_parallel > 1 and a mesh context)
        seq_parallel=ve.get("seq_parallel", False),
    )
    extra = {
        k: ve[k]
        for k in ("embed_dim", "num_heads", "ffn_dim", "num_layers")
        if k in ve
    }  # non-reference extension: tiny encoders for smoke/CI runs
    if extra:
        beit3 = BEiT3Config(**common, **extra)
    else:
        mk = BEiT3Config.base if vit_type == "base" else BEiT3Config.large
        beit3 = mk(**common)

    head_cfg = TGQSHeadConfig(
        num_queries=head.get("num_queries", 1),
        in_channels=head.get("in_channels", beit3.embed_dim),
        embed_dim=head.get("embed_dim", 256),
        num_classes=head.get("num_classes", 1),
        text_max_token=head.get("text_max_token", 20),
        num_encoder_layers=head.get("num_encoder_layers", 6),
        num_decoder_layers=head.get("num_decoder_layers", 3),
        num_tgqg_layers=head.get("num_tgqg_layers", 1),
        only_decoder=head.get("only_decoder", True),
        num_token_mlp_layers=head.get("num_token_mlp_layers", 1),
        text_guided_query_generation=head.get(
            "text_guided_query_generation", True
        ),
        tgqs_mid_dim=head.get("tgqs_mid_dim", 512),
        share_predicthead=head.get("share_predicthead", False),
        dtype=dtype,
    )

    model = SimVGModel(SimVGConfig(beit3=beit3, head=head_cfg))

    loss_cfg = {
        "branch_loss_weight": dict(head.get(
            "branch_loss_weight",
            {"decoder": 1.0,
             "balanced_distill": {"token": 2.0, "distill": 1.0}},
        )),
        "prepare_target_mode": head.get("prepare_target_mode",
                                        "score_iou_weighted"),
        "distill_type": head.get("distill_type", "hard_weighted"),
        "mlp_aux_loss": head.get("mlp_aux_loss", False),
        "as_target_query_thr": head.get("as_target_query_thr", 0.0),
        "freeze_layer": ve.get("freeze_layer", -1),
        "pretrain": ve.get("pretrain", None),
    }
    return model, loss_cfg
