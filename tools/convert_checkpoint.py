#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to simvg_tpu flax params.

Handles two checkpoint families:

1. **BEiT-3 pretrain** (microsoft/unilm releases, loaded by the
   reference at simvg/models/vis_encs/beit/beit3.py:92-174): keys
   ``beit3.encoder.layers.N...`` with multiway A/B submodules.  Includes
   the positional-embedding bicubic interpolation (224-grid -> target
   grid; beit3.py:115-159) and the patch-projection interpolation
   (16x16 -> 32x32 kernel; beit3.py:161-172), done with torch so the
   resampling math is bit-identical.

2. **Full SimVG checkpoints** (reference ``latest.pth``/``det_best.pth``,
   saved by simvg/utils/checkpoint.py:120-150): ``vis_enc.beit3...`` +
   ``head...`` keys including the detrex transformer layers (packed
   ``in_proj_weight`` split into q/k/v).

Conventions: torch Linear weight [out, in] -> flax kernel [in, out];
torch Conv2d [out, in, kh, kw] -> flax [kh, kw, in, out]; LayerNorm
weight -> scale.

CLI:
    python tools/convert_checkpoint.py IN.pth OUT_DIR \
        [--img-size 640 --patch-size 32 --vit base]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


# --------------------------------------------------------------- helpers

def _t(w):  # torch Linear weight -> flax kernel
    return np.ascontiguousarray(np.asarray(w).T)


def _set(params: Dict, path: str, value: np.ndarray, report: list):
    node = params["params"]
    parts = [p for p in path.split("/") if p]
    for p in parts[:-1]:
        node = node[p]
    old = node[parts[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}: {old.shape} vs {value.shape}"
        )
    node[parts[-1]] = value.astype(np.asarray(old).dtype)
    report.append(path)


def interpolate_pos_embed(weight: np.ndarray, target_len: int,
                          num_extra: int = 3) -> np.ndarray:
    """Bicubic grid interpolation of the torchscale vision positional
    table (first ``num_extra`` rows = [pad offset x2, CLS] kept as-is),
    matching beit3.py:115-159."""
    import torch
    import torch.nn.functional as F

    if weight.shape[0] == target_len:
        return weight
    extra = weight[:num_extra]
    pos = weight[num_extra:]
    orig = int(round(len(pos) ** 0.5))
    new = int(round((target_len - num_extra) ** 0.5))
    assert orig * orig == len(pos), (len(pos), orig)
    assert new * new == target_len - num_extra
    t = torch.from_numpy(
        np.ascontiguousarray(pos)
    ).float().reshape(1, orig, orig, -1).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(new, new), mode="bicubic",
                      align_corners=False)
    t = t.permute(0, 2, 3, 1).reshape(new * new, -1).numpy()
    return np.concatenate([extra, t], axis=0)


def interpolate_patch_proj(weight: np.ndarray, target_hw) -> np.ndarray:
    """Bicubic resize of the conv patchify kernel (torch layout
    [out, in, kh, kw]), matching beit3.py:161-172."""
    import torch
    import torch.nn.functional as F

    if tuple(weight.shape[-2:]) == tuple(target_hw):
        return weight
    t = torch.from_numpy(np.ascontiguousarray(weight)).float()
    t = F.interpolate(t, size=tuple(target_hw), mode="bicubic",
                      align_corners=False)
    return t.numpy()


# ------------------------------------------------- beit3 encoder mapping

def convert_beit3_encoder(sd: Dict[str, np.ndarray], params: Dict,
                          prefix: str = "beit3.",
                          out_prefix: str = "beit3",
                          logger=None) -> list:
    """Map ``{prefix}...`` torch keys into params['params'][out_prefix]
    (empty out_prefix = encoder params at the root)."""
    report: list = []
    tgt = params["params"][out_prefix] if out_prefix else params["params"]

    def grab(k):
        return np.asarray(sd[prefix + k])

    n_pos_target = tgt["vision_pos_embed"]["embedding"].shape[0]
    vis_pos = grab("encoder.embed_positions.A.weight")
    vis_pos = interpolate_pos_embed(vis_pos, n_pos_target)
    _set(params, f"{out_prefix}/vision_pos_embed/embedding", vis_pos,
         report)
    text_pos = grab("encoder.embed_positions.B.weight")
    n_text_target = tgt["text_pos_embed"]["embedding"].shape[0]
    if text_pos.shape[0] != n_text_target:
        # learned text positions: copy the overlapping prefix rows
        # (the reference's non-strict load would DROP the whole table on
        # mismatch, beit3.py load_state_dict; prefix copy keeps every
        # position the checkpoint actually trained)
        merged = np.array(tgt["text_pos_embed"]["embedding"])
        n = min(text_pos.shape[0], n_text_target)
        merged[:n] = text_pos[:n]
        text_pos = merged
    _set(params, f"{out_prefix}/text_pos_embed/embedding",
         text_pos, report)
    _set(params, f"{out_prefix}/text_embed/embedding",
         grab("text_embed.weight"), report)

    proj_w = grab("vision_embed.proj.weight")
    k_target = tgt["vision_embed"]["proj"]["kernel"]
    proj_w = interpolate_patch_proj(
        proj_w, (k_target.shape[0], k_target.shape[1])
    )
    _set(params, f"{out_prefix}/vision_embed/proj/kernel",
         np.transpose(proj_w, (2, 3, 1, 0)), report)
    _set(params, f"{out_prefix}/vision_embed/proj/bias",
         grab("vision_embed.proj.bias"), report)
    _set(params, f"{out_prefix}/vision_embed/cls_token",
         grab("vision_embed.cls_token"), report)
    if prefix + "vision_embed.mask_token" in sd:
        _set(params, f"{out_prefix}/vision_embed/mask_token",
             grab("vision_embed.mask_token"), report)

    n_layers = len([k for k in tgt if k.startswith("layers_")])
    for i in range(n_layers):
        src = f"encoder.layers.{i}."
        dst = f"{out_prefix}/layers_{i}"
        for ab in ("A", "B"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                _set(params, f"{dst}/self_attn/{proj}_{ab}/kernel",
                     _t(grab(f"{src}self_attn.{proj}.{ab}.weight")),
                     report)
                _set(params, f"{dst}/self_attn/{proj}_{ab}/bias",
                     grab(f"{src}self_attn.{proj}.{ab}.bias"), report)
            _set(params, f"{dst}/self_attn/inner_attn_ln_{ab}/scale",
                 grab(f"{src}self_attn.inner_attn_ln.{ab}.weight"),
                 report)
            _set(params, f"{dst}/self_attn/inner_attn_ln_{ab}/bias",
                 grab(f"{src}self_attn.inner_attn_ln.{ab}.bias"), report)
            _set(params, f"{dst}/self_attn_layer_norm_{ab}/scale",
                 grab(f"{src}self_attn_layer_norm.{ab}.weight"), report)
            _set(params, f"{dst}/self_attn_layer_norm_{ab}/bias",
                 grab(f"{src}self_attn_layer_norm.{ab}.bias"), report)
            _set(params, f"{dst}/ffn/fc1_{ab}/kernel",
                 _t(grab(f"{src}ffn.{ab}.fc1.weight")), report)
            _set(params, f"{dst}/ffn/fc1_{ab}/bias",
                 grab(f"{src}ffn.{ab}.fc1.bias"), report)
            _set(params, f"{dst}/ffn/fc2_{ab}/kernel",
                 _t(grab(f"{src}ffn.{ab}.fc2.weight")), report)
            _set(params, f"{dst}/ffn/fc2_{ab}/bias",
                 grab(f"{src}ffn.{ab}.fc2.bias"), report)
            _set(params, f"{dst}/ffn/ffn_layernorm_{ab}/scale",
                 grab(f"{src}ffn.{ab}.ffn_layernorm.weight"), report)
            _set(params, f"{dst}/ffn/ffn_layernorm_{ab}/bias",
                 grab(f"{src}ffn.{ab}.ffn_layernorm.bias"), report)
            _set(params, f"{dst}/final_layer_norm_{ab}/scale",
                 grab(f"{src}final_layer_norm.{ab}.weight"), report)
            _set(params, f"{dst}/final_layer_norm_{ab}/bias",
                 grab(f"{src}final_layer_norm.{ab}.bias"), report)

    for ab in ("A", "B"):
        _set(params, f"{out_prefix}/layer_norm_{ab}/scale",
             grab(f"encoder.layer_norm.{ab}.weight"), report)
        _set(params, f"{out_prefix}/layer_norm_{ab}/bias",
             grab(f"encoder.layer_norm.{ab}.bias"), report)

    if logger:
        logger.info(f"converted {len(report)} beit3 tensors")
    return report


# ----------------------------------------------- detrex layers + head

def _convert_detr_layer(sd, params, src: str, dst: str, report,
                        has_cross: bool):
    """One detrex BaseTransformerLayer: attentions.N.attn
    (packed in_proj) + ffns.0.layers + norms.N."""
    attn_names = (["self_attn", "cross_attn"] if has_cross
                  else ["self_attn"])
    for n, name in enumerate(attn_names):
        w = np.asarray(sd[f"{src}attentions.{n}.attn.in_proj_weight"])
        b = np.asarray(sd[f"{src}attentions.{n}.attn.in_proj_bias"])
        d = w.shape[1]
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, f"{dst}/{name}/{proj}/kernel",
                 _t(w[j * d:(j + 1) * d]), report)
            _set(params, f"{dst}/{name}/{proj}/bias",
                 b[j * d:(j + 1) * d], report)
        _set(params, f"{dst}/{name}/out_proj/kernel",
             _t(sd[f"{src}attentions.{n}.attn.out_proj.weight"]), report)
        _set(params, f"{dst}/{name}/out_proj/bias",
             np.asarray(sd[f"{src}attentions.{n}.attn.out_proj.bias"]),
             report)
    _set(params, f"{dst}/ffn/fc1/kernel",
         _t(sd[f"{src}ffns.0.layers.0.0.weight"]), report)
    _set(params, f"{dst}/ffn/fc1/bias",
         np.asarray(sd[f"{src}ffns.0.layers.0.0.bias"]), report)
    _set(params, f"{dst}/ffn/fc2/kernel",
         _t(sd[f"{src}ffns.0.layers.1.weight"]), report)
    _set(params, f"{dst}/ffn/fc2/bias",
         np.asarray(sd[f"{src}ffns.0.layers.1.bias"]), report)
    n_norms = 3 if has_cross else 2
    for n in range(n_norms):
        _set(params, f"{dst}/norm{n + 1}/scale",
             np.asarray(sd[f"{src}norms.{n}.weight"]), report)
        _set(params, f"{dst}/norm{n + 1}/bias",
             np.asarray(sd[f"{src}norms.{n}.bias"]), report)


def _convert_mlp(sd, params, src: str, dst: str, report, n_layers: int):
    for i in range(n_layers):
        _set(params, f"{dst}/layers_{i}/kernel",
             _t(sd[f"{src}layers.{i}.weight"]), report)
        _set(params, f"{dst}/layers_{i}/bias",
             np.asarray(sd[f"{src}layers.{i}.bias"]), report)


def convert_simvg_full(sd: Dict[str, np.ndarray], params: Dict,
                       logger=None) -> list:
    """Full reference checkpoint: vis_enc.beit3.* + head.*."""
    report = convert_beit3_encoder(sd, params, prefix="vis_enc.beit3.",
                                   out_prefix="beit3", logger=logger)
    head = params["params"]["head"]

    # input projections (Conv1x1 -> dense)
    w = np.asarray(sd["head.input_proj.weight"])  # [256, C, 1, 1]
    hp = {"params": {"head": head}}
    _set(hp, "head/input_proj/kernel", _t(w[:, :, 0, 0]), report)
    _set(hp, "head/input_proj/bias",
         np.asarray(sd["head.input_proj.bias"]), report)
    for name in ("input_text_proj", "input_cls_proj"):
        _set(hp, f"head/{name}/kernel",
             _t(sd[f"head.{name}.weight"]), report)
        _set(hp, f"head/{name}/bias",
             np.asarray(sd[f"head.{name}.bias"]), report)

    _set(hp, "head/query_embed",
         np.asarray(sd["head.query_embed.weight"]), report)

    # token branch MLP + class/bbox heads
    if "mlp" in head:
        n = len([k for k in head["mlp"] if k.startswith("layers_")])
        _convert_mlp(sd, hp, "head.mlp.", "head/mlp", report, n)
    for branch in ("token", "decoder"):
        _set(hp, f"head/class_embed_{branch}/kernel",
             _t(sd[f"head.class_embed_{branch}.weight"]), report)
        _set(hp, f"head/class_embed_{branch}/bias",
             np.asarray(sd[f"head.class_embed_{branch}.bias"]), report)
        _convert_mlp(sd, hp, f"head.bbox_embed_{branch}.",
                     f"head/bbox_embed_{branch}", report, 3)

    # TGQG decoder
    if "tgqg" in head:
        n = len([k for k in head["tgqg"] if k.startswith("layers_")])
        base = "head.text_guided_query_generation_transformer."
        for i in range(n):
            _convert_detr_layer(sd, hp, f"{base}layers.{i}.",
                                f"head/tgqg/layers_{i}", report,
                                has_cross=True)
        _set(hp, "head/tgqg/post_norm_layer/scale",
             np.asarray(sd[base + "post_norm_layer.weight"]), report)
        _set(hp, "head/tgqg/post_norm_layer/bias",
             np.asarray(sd[base + "post_norm_layer.bias"]), report)

    # main DETR decoder
    n = len([k for k in head["decoder"] if k.startswith("layers_")])
    for i in range(n):
        _convert_detr_layer(
            sd, hp, f"head.transformer.decoder.layers.{i}.",
            f"head/decoder/layers_{i}", report, has_cross=True,
        )
    _set(hp, "head/decoder/post_norm_layer/scale",
         np.asarray(sd["head.transformer.decoder.post_norm_layer.weight"]),
         report)
    _set(hp, "head/decoder/post_norm_layer/bias",
         np.asarray(sd["head.transformer.decoder.post_norm_layer.bias"]),
         report)

    if "encoder" in head:
        n = len([k for k in head["encoder"] if k.startswith("layers_")])
        for i in range(n):
            _convert_detr_layer(
                sd, hp, f"head.transformer.encoder.layers.{i}.",
                f"head/encoder/layers_{i}", report, has_cross=False,
            )

    if logger:
        logger.info(f"converted {len(report)} tensors total")
    return report


# ------------------------------------------------------------- loading

# --------------------------------------------- HF BERT/roberta lan_enc

def convert_hf_bert(sd: Dict[str, np.ndarray], params: Dict,
                    out_prefix: str = "lan_enc", logger=None) -> list:
    """HF BERT/roberta state dict -> BERTLanguageEncoder params.

    The reference's ALBERTA lan_enc is HF ``AutoModel`` roberta-base
    (simvg/models/lan_encs/bert.py:35); our encoder replicates the HF
    post-LN layout so the mapping is weight-for-weight:

    - ``embeddings.{word,position}_embeddings`` -> Embed tables; the
      token_type row 0 (added uniformly to every position by HF when
      token_type_ids are all zero) is folded into the position table;
    - per layer: attention.self.{query,key,value} -> q/k/v,
      attention.output.dense -> o, attention.output.LayerNorm ->
      attn_ln, intermediate/output.dense -> fc1/fc2, output.LayerNorm
      -> ffn_ln (torch Linear weights transposed to flax kernels).
    """
    for model_prefix in ("roberta.", "bert."):
        if any(k.startswith(model_prefix + "embeddings.") for k in sd):
            sd = {k[len(model_prefix):]: v for k, v in sd.items()
                  if k.startswith(model_prefix)}
            break
    report: list = []
    p = (out_prefix + "/") if out_prefix else ""

    pos = np.asarray(sd["embeddings.position_embeddings.weight"],
                     np.float32).copy()
    tt = sd.get("embeddings.token_type_embeddings.weight")
    if tt is not None:
        pos = pos + np.asarray(tt, np.float32)[0]
    _set(params, p + "word_embeddings/embedding",
         np.asarray(sd["embeddings.word_embeddings.weight"]), report)
    _set(params, p + "position_embeddings/embedding", pos, report)
    _set(params, p + "embeddings_ln/scale",
         np.asarray(sd["embeddings.LayerNorm.weight"]), report)
    _set(params, p + "embeddings_ln/bias",
         np.asarray(sd["embeddings.LayerNorm.bias"]), report)

    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        L = f"encoder.layer.{i}."
        for src, dst in (
            ("attention.self.query", f"q_{i}"),
            ("attention.self.key", f"k_{i}"),
            ("attention.self.value", f"v_{i}"),
            ("attention.output.dense", f"o_{i}"),
            ("intermediate.dense", f"fc1_{i}"),
            ("output.dense", f"fc2_{i}"),
        ):
            _set(params, p + dst + "/kernel", _t(sd[L + src + ".weight"]),
                 report)
            _set(params, p + dst + "/bias",
                 np.asarray(sd[L + src + ".bias"]), report)
        for src, dst in (
            ("attention.output.LayerNorm", f"attn_ln_{i}"),
            ("output.LayerNorm", f"ffn_ln_{i}"),
        ):
            _set(params, p + dst + "/scale",
                 np.asarray(sd[L + src + ".weight"]), report)
            _set(params, p + dst + "/bias",
                 np.asarray(sd[L + src + ".bias"]), report)
        i += 1

    node = params["params"]
    for part in (out_prefix.split("/") if out_prefix else []):
        node = node[part]
    n_target = sum(1 for k in node if k.startswith("q_"))
    if i != n_target:
        raise ValueError(
            f"HF checkpoint has {i} layers, encoder expects {n_target}")
    if logger:
        logger.info(f"converted {len(report)} HF-BERT tensors "
                    f"({i} layers)")
    return report


def _torch_load(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "module", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}


def load_pretrained_into_params(params, path: str, logger=None):
    """Dispatch by key inventory: BEiT-3 pretrain vs full SimVG.
    Handles scan-layer (stacked) targets transparently."""
    import jax

    params = jax.tree.map(np.asarray, params)
    params = _deep_dict(params)

    tree = params["params"].get("beit3", params["params"])
    scanned = "layers" in tree and not any(
        k.startswith("layers_") for k in tree
    )
    if scanned:
        params = _deep_dict(unstack_scan_layers(params))

    sd = _torch_load(path)
    if any(k.startswith("vis_enc.") for k in sd):
        convert_simvg_full(sd, params, logger=logger)
    elif any("embeddings.word_embeddings.weight" in k for k in sd):
        # HF BERT/roberta checkpoint for the legacy ALBERTA lan_enc
        convert_hf_bert(sd, params, logger=logger)
    else:
        convert_beit3_encoder(sd, params, logger=logger)

    if scanned:
        params = stack_scan_layers(params)
    return params


def _deep_dict(d):
    if isinstance(d, dict):
        return {k: _deep_dict(v) for k, v in d.items()}
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help=".pth/.zip torch checkpoint")
    ap.add_argument("output", help="orbax checkpoint dir")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--patch-size", type=int, default=32)
    ap.add_argument("--vit", default="base", choices=["base", "large"])
    ap.add_argument("--num-queries", type=int, default=1)
    # tiny-encoder overrides (testing / custom sizes)
    ap.add_argument("--embed-dim", type=int, default=None)
    ap.add_argument("--num-heads", type=int, default=None)
    ap.add_argument("--ffn-dim", type=int, default=None)
    ap.add_argument("--num-layers", type=int, default=None)
    ap.add_argument("--vocab-size", type=int, default=64010)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import os as _os

        _os.environ["JAX_PLATFORMS"] = args.platform

    import jax

    if args.platform:
        # this environment's sitecustomize overrides jax_platforms via
        # config, so the env var alone is ignored — re-assert it or the
        # conversion compiles on the real TPU through the slow tunnel
        jax.config.update("jax_platforms", args.platform)

    from simvg_tpu.models.builder import build_model
    from simvg_tpu.utils.checkpoint import save_checkpoint

    ve = {"vit_type": args.vit, "img_size": args.img_size,
          "patch_size": args.patch_size, "vocab_size": args.vocab_size}
    for k in ("embed_dim", "num_heads", "ffn_dim", "num_layers"):
        v = getattr(args, k)
        if v is not None:
            ve[k] = v
    in_ch = ve.get("embed_dim", 768 if args.vit == "base" else 1024)
    model, _ = build_model(
        {"type": "MIXDETRMB", "vis_enc": ve,
         "head": {"num_queries": args.num_queries, "in_channels": in_ch,
                  "embed_dim": min(256, in_ch)}},
        img_size=args.img_size,
    )
    b = 1
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0),
        image=jnp.zeros((b, args.img_size, args.img_size, 3)),
        text_ids=jnp.zeros((b, 20), jnp.int32),
        text_padding_mask=jnp.zeros((b, 20), jnp.int32),
        img_shape=jnp.full((b, 2), args.img_size, jnp.int32),
    )
    params = load_pretrained_into_params(params, args.input)
    import os

    os.makedirs(osp.dirname(osp.abspath(args.output)) or ".",
                exist_ok=True)
    save_checkpoint(osp.dirname(osp.abspath(args.output)),
                    osp.basename(args.output), params=params,
                    block=True)
    print(f"wrote {args.output}")



# ------------------------------------------------------------- export

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def export_simvg_full(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_simvg_full: flax params -> torch state dict
    with the reference's key names (vis_enc.beit3.* / head.*), so
    trained weights can round-trip back to the reference stack."""
    flat = _flatten(params["params"])
    sd: Dict[str, np.ndarray] = {}

    def put(torch_key, value, transpose=False):
        sd[torch_key] = np.ascontiguousarray(value.T if transpose
                                             else value)

    packed_qkv: Dict[str, Dict[str, np.ndarray]] = {}

    for path, v in flat.items():
        parts = path.split("/")
        if parts[0] == "beit3":
            if path == "beit3/vision_embed/proj/kernel":
                # flax conv [kh, kw, in, out] -> torch [out, in, kh, kw]
                sd["vis_enc.beit3.vision_embed.proj.weight"] = (
                    np.ascontiguousarray(np.transpose(v, (3, 2, 0, 1)))
                )
                continue
            key = _export_beit3_key(parts[1:])
            if key is None:
                continue
            torch_key, transpose = key
            put("vis_enc.beit3." + torch_key, v, transpose)
        elif parts[0] == "head":
            _export_head_entry(parts[1:], v, sd, packed_qkv)

    # assemble packed in_proj tensors for the detrex attention modules
    for base, parts_map in packed_qkv.items():
        for suffix, names in (("weight", ("q_kernel", "k_kernel",
                                          "v_kernel")),
                              ("bias", ("q_bias", "k_bias", "v_bias"))):
            if names[0] in parts_map:
                mats = [parts_map[n] for n in names]
                if suffix == "weight":
                    mats = [m.T for m in mats]
                sd[base + f".in_proj_{suffix}"] = np.ascontiguousarray(
                    np.concatenate(mats, axis=0)
                )
    return sd


def _export_beit3_key(parts):
    """flax beit3 path -> (torch key under beit3., transpose?)."""
    p = "/".join(parts)
    simple = {
        "text_embed/embedding": ("text_embed.weight", False),
        "vision_pos_embed/embedding":
            ("encoder.embed_positions.A.weight", False),
        "text_pos_embed/embedding":
            ("encoder.embed_positions.B.weight", False),
        "vision_embed/cls_token": ("vision_embed.cls_token", False),
        "vision_embed/mask_token": ("vision_embed.mask_token", False),
        "vision_embed/proj/bias": ("vision_embed.proj.bias", False),
        "layer_norm_A/scale": ("encoder.layer_norm.A.weight", False),
        "layer_norm_A/bias": ("encoder.layer_norm.A.bias", False),
        "layer_norm_B/scale": ("encoder.layer_norm.B.weight", False),
        "layer_norm_B/bias": ("encoder.layer_norm.B.bias", False),
    }
    if p in simple:
        return simple[p]
    if p == "vision_embed/proj/kernel":
        return None  # 4-D conv kernel: handled by the caller
    if parts[0].startswith("layers_"):
        i = parts[0].split("_")[1]
        rest = parts[1:]
        base = f"encoder.layers.{i}."
        if rest[0] == "self_attn":
            name = rest[1]  # e.g. q_proj_A / inner_attn_ln_A
            leaf = rest[2]  # kernel/bias/scale
            mod, ab = name.rsplit("_", 1)
            tleaf = {"kernel": "weight", "scale": "weight",
                     "bias": "bias"}[leaf]
            return (f"{base}self_attn.{mod}.{ab}.{tleaf}",
                    leaf == "kernel")
        if rest[0] == "ffn":
            mod, ab = rest[1].rsplit("_", 1)
            leaf = rest[2]
            tleaf = {"kernel": "weight", "scale": "weight",
                     "bias": "bias"}[leaf]
            return (f"{base}ffn.{ab}.{mod}.{tleaf}", leaf == "kernel")
        mod, ab = rest[0].rsplit("_", 1)
        leaf = rest[1]
        tleaf = {"kernel": "weight", "scale": "weight",
                 "bias": "bias"}[leaf]
        return (f"{base}{mod}.{ab}.{tleaf}", False)
    return None


def _export_head_entry(parts, v, sd, packed_qkv):
    p = "/".join(parts)

    def put(key, val, transpose=False):
        sd["head." + key] = np.ascontiguousarray(val.T if transpose
                                                 else val)

    if p == "query_embed":
        put("query_embed.weight", v)
        return
    if parts[0] == "input_proj":
        if parts[1] == "kernel":
            put("input_proj.weight", v.T[:, :, None, None])
        else:
            put("input_proj.bias", v)
        return
    if parts[0] in ("input_text_proj", "input_cls_proj",
                    "class_embed_token", "class_embed_decoder"):
        put(f"{parts[0]}.{'weight' if parts[1] == 'kernel' else 'bias'}",
            v, parts[1] == "kernel")
        return
    if parts[0] in ("mlp", "bbox_embed_token", "bbox_embed_decoder"):
        i = parts[1].split("_")[1]
        put(f"{parts[0]}.layers.{i}."
            f"{'weight' if parts[2] == 'kernel' else 'bias'}",
            v, parts[2] == "kernel")
        return
    if parts[0] in ("decoder", "tgqg", "encoder"):
        tname = {"decoder": "transformer.decoder",
                 "encoder": "transformer.encoder",
                 "tgqg": "text_guided_query_generation_transformer"}[
            parts[0]]
        if parts[1] == "post_norm_layer":
            put(f"{tname}.post_norm_layer."
                f"{'weight' if parts[2] == 'scale' else 'bias'}", v)
            return
        i = parts[1].split("_")[1]
        base = f"{tname}.layers.{i}."
        rest = parts[2:]
        if rest[0] in ("self_attn", "cross_attn"):
            n = 0 if rest[0] == "self_attn" else 1
            attn_base = f"head.{base}attentions.{n}.attn"
            if rest[1] == "out_proj":
                put(f"{base}attentions.{n}.attn.out_proj."
                    f"{'weight' if rest[2] == 'kernel' else 'bias'}",
                    v, rest[2] == "kernel")
            else:  # q/k/v proj -> packed in_proj
                proj = rest[1][0]  # q/k/v
                leaf = "kernel" if rest[2] == "kernel" else "bias"
                packed_qkv.setdefault(attn_base, {})[
                    f"{proj}_{leaf}"] = v
            return
        if rest[0] == "ffn":
            idx = "0.0" if rest[1] == "fc1" else "1"
            put(f"{base}ffns.0.layers.{idx}."
                f"{'weight' if rest[2] == 'kernel' else 'bias'}",
                v, rest[2] == "kernel")
            return
        if rest[0].startswith("norm"):
            n = int(rest[0][4:]) - 1
            put(f"{base}norms.{n}."
                f"{'weight' if rest[1] == 'scale' else 'bias'}", v)
            return


def stack_scan_layers(params: Dict) -> Dict:
    """Per-layer params (layers_0..layers_{N-1}) -> stacked scan layout
    (one "layers" subtree with a leading [N] axis), for models built
    with BEiT3Config.scan_layers=True."""
    import jax

    out = {"params": dict(params["params"])}
    tree = out["params"]["beit3"] if "beit3" in out["params"] \
        else out["params"]
    names = sorted(
        (k for k in tree if k.startswith("layers_")),
        key=lambda k: int(k.split("_")[1]),
    )
    if not names:
        return params
    per_layer = [tree[k] for k in names]
    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *per_layer)
    # scan bodies have no drop_path submodule (rate is a traced input)
    stacked.pop("drop_path", None)
    for k in names:
        del tree[k]
    tree["layers"] = stacked
    return out


def unstack_scan_layers(params: Dict) -> Dict:
    """Inverse of stack_scan_layers."""
    import jax

    out = {"params": dict(params["params"])}
    tree = out["params"]["beit3"] if "beit3" in out["params"] \
        else out["params"]
    if "layers" not in tree:
        return params
    stacked = tree.pop("layers")
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        tree[f"layers_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return out


if __name__ == "__main__":
    main()
