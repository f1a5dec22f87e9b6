# Scaled synthetic convergence base (the "big" tier of the README
# convergence ladder): 512 train / 64 val images, 8-layer/256-dim
# encoder.  Purpose (VERDICT r4 #2): the 4-layer/128-dim tier's token
# branch is ceilinged by CLS capacity (token-only control: 18.75%);
# this tier is where the distillation mechanism itself can be judged —
# the encoder is rich enough for the CLS pathway to carry geometry.
# Generate data first:
#   python tools/make_synth_data.py --root /tmp/synth_converge_big \
#       --n-train 512 --n-val 64
_base_ = ["./converge_synth.py"]

data_root = "/tmp/synth_converge_big/"
data = dict(
    samples_per_gpu=32,
    train=dict(annsfile=data_root + "instances.json",
               imgsfile=data_root + "images"),
    val=dict(annsfile=data_root + "instances.json",
             imgsfile=data_root + "images"),
)

model = dict(
    vis_enc=dict(embed_dim=256, num_heads=8, ffn_dim=1024, num_layers=8),
    head=dict(in_channels=256, embed_dim=256),
)
