"""Per-layer torch<->JAX parity probe for checkpoint conversion.

When the released-weight gate (`make parity`) misses the within-0.3
target, this localizes the break in minutes instead of bisecting by
hand: it loads a reference-format BEiT-3 state dict, runs BOTH

- the independent torch oracle (tests/test_checkpoint_convert.TorchBeit3
  — already parity-proven against the flax encoder at full scale), and
- our converted flax encoder (tools/convert_checkpoint),

on the same fixed input, capturing every encoder layer's output, and
prints a per-layer max-abs-diff table.  A conversion bug shows up as
the first layer where the diff jumps.

Usage:
    python tools/misc/parity_probe.py CKPT.pth --img-size 640 \
        --patch-size 32 [--vit base|large] [--seed 0]

SURVEY §4 test strategy (c): "compare per-layer activations".
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="reference-format .pth/.zip state dict")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--patch-size", type=int, default=32)
    ap.add_argument("--vit", default="base", choices=["base", "large"])
    ap.add_argument("--max-token", type=int, default=20)
    ap.add_argument("--heads", type=int, default=None,
                    help="num heads (default: 12 for 768, 16 for 1024, else dim//64)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu",
                    help="force platform (fp32 CPU = bit-repeatable)")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import torch

    from convert_checkpoint import _torch_load, convert_beit3_encoder
    from test_checkpoint_convert import TorchBeit3
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    sd = _torch_load(args.ckpt)
    prefix = "beit3." if any(k.startswith("beit3.") for k in sd) else ""
    d = sd[prefix + "text_embed.weight"].shape[1]
    vocab = sd[prefix + "text_embed.weight"].shape[0]
    n_layers = 1 + max(
        int(k[len(prefix):].split(".")[2]) for k in sd
        if k.startswith(prefix + "encoder.layers."))
    ffn = sd[prefix + "encoder.layers.0.ffn.A.fc1.weight"].shape[0]
    heads = args.heads or {768: 12, 1024: 16}.get(
        d, max(1, d // 64))
    ckpt_ps = sd[prefix + "vision_embed.proj.weight"].shape[-1]
    ckpt_pos = sd[prefix + "encoder.embed_positions.A.weight"].shape[0]
    ckpt_grid = int(round((ckpt_pos - 3) ** 0.5))
    max_pos = sd[prefix + "encoder.embed_positions.B.weight"].shape[0]
    print(f"checkpoint: dim={d} layers={n_layers} ffn={ffn} "
          f"vocab={vocab} patch={ckpt_ps} grid={ckpt_grid}x{ckpt_grid}")

    # ---- torch oracle at TARGET geometry, loaded with the reference's
    # interpolation semantics (reuse the proven helpers)
    from test_full_scale_parity import _reference_interpolate_sd

    new_grid = args.img_size // args.patch_size
    sd_t = {("beit3." + k[len(prefix):]) if prefix != "beit3." else k: v
            for k, v in sd.items()}
    sd32 = _reference_interpolate_sd(sd_t, d, new_grid=new_grid,
                                     new_ps=args.patch_size)
    tm = TorchBeit3(img=args.img_size, ps=args.patch_size, d=d,
                    heads=heads, ffn_d=ffn, layers=n_layers,
                    vocab=vocab, max_pos=max_pos)
    tm.load_state_dict(
        {k[len("beit3."):]: torch.from_numpy(np.asarray(v))
         for k, v in sd32.items()})
    tm.eval()

    # ---- our converted encoder (raw sd; converter interpolates)
    cfg = BEiT3Config(img_size=args.img_size,
                      patch_size=args.patch_size, embed_dim=d,
                      num_heads=heads, ffn_dim=ffn,
                      num_layers=n_layers, vocab_size=vocab,
                      max_source_positions=max_pos, drop_path_rate=0.0)
    enc = BEiT3Encoder(cfg)
    rng = np.random.default_rng(args.seed)
    b = 1
    img = rng.normal(size=(b, args.img_size, args.img_size, 3)).astype(
        np.float32)
    ids = rng.integers(0, vocab, (b, args.max_token)).astype(np.int32)
    pad = np.zeros((b, args.max_token), np.int32)
    pad[:, args.max_token // 2:] = 1

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(img),
                      jnp.asarray(ids), jnp.asarray(pad))

    def deep(x):
        return {k: deep(v) for k, v in x.items()} if isinstance(
            x, dict) else np.asarray(x)

    params = deep(params)
    convert_beit3_encoder(sd_t, params, prefix="beit3.", out_prefix="")

    # ---- per-layer capture: torch hooks + flax capture_intermediates
    torch_layer_outs = []

    def hook(_m, _i, out):
        torch_layer_outs.append(out.detach().numpy())

    for layer in tm.encoder.layers:
        layer.register_forward_hook(hook)
    with torch.no_grad():
        ti, tt, tc = tm(torch.from_numpy(img).permute(0, 3, 1, 2),
                        torch.from_numpy(ids.astype(np.int64)),
                        torch.from_numpy(pad.astype(np.int64)))

    out, state = enc.apply(
        params, jnp.asarray(img), jnp.asarray(ids), jnp.asarray(pad),
        capture_intermediates=lambda mdl, _: "layers_" in mdl.name
        if mdl.name else False)
    inter = state["intermediates"]
    split = cfg.seq_vision

    print(f"\n{'layer':>8} {'max_abs_diff':>14} {'mean_abs':>12}")
    worst = (0.0, -1)
    for i in range(n_layers):
        xs = inter[f"layers_{i}"]["__call__"][0]
        ours = np.concatenate(
            [np.asarray(xs[0]), np.asarray(xs[1])], axis=1)
        diff = np.abs(ours - torch_layer_outs[i]).max()
        if diff > worst[0]:
            worst = (float(diff), i)
        print(f"{i:>8} {diff:>14.3e} "
              f"{np.abs(torch_layer_outs[i]).mean():>12.3e}")

    ji, jt, jc = out
    for name, ours, ref in (("img", ji, ti), ("text", jt, tt),
                            ("cls", jc, tc)):
        print(f"{'out:' + name:>8} "
              f"{np.abs(np.asarray(ours) - ref.numpy()).max():>14.3e} "
              f"{np.abs(ref.numpy()).mean():>12.3e}")
    print(f"\nworst layer: {worst[1]} (max abs diff {worst[0]:.3e}); "
          "a jump between consecutive layers localizes a conversion "
          "bug to that layer's parameter mapping")


if __name__ == "__main__":
    main()
