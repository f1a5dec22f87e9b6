# GRefCOCO synthetic convergence proof (README "GRec synthetic
# convergence"): multi-target (up to 2) + no-target expressions on
# non-square (96x128) images, exercising the truncation-aware
# num_boxes (gt_count), Hungarian multi-target matching, GRec F1/N-acc
# eval, and the balanced-distill regime.  Generate data first:
#   python tools/make_synth_data.py --root /tmp/synth_converge_grec_r3 \
#       --style grefcoco --n-train 24 --n-val 12
_base_ = ["./converge_synth.py"]

dataset = "GRefCOCO"
max_gt = 4

data_root = "/tmp/synth_converge_grec_r3/"
data = dict(
    train=dict(type=dataset, annsfile=data_root + "instances.json",
               imgsfile=data_root + "images"),
    val=dict(type=dataset, annsfile=data_root + "instances.json",
             imgsfile=data_root + "images"),
)

ema = True
model = dict(head=dict(num_queries=10))
lr = 0.001
optimizer_config = dict(lr=lr, lr_vis_enc=lr, lr_lan_enc=lr)
scheduler_config = dict(warmup_epochs=1, decay_steps=[900],
                        max_epoch=1200)
evaluate_interval = 50
log_interval = 64
