# Deep-regime token-prune accuracy probe (VERDICT r3 #3): the flagship's
# SHAPE regime at scaled-down width — 12 encoder layers and a 20x20 =
# 400-patch-token grid (patch 8 @ 160px canvas; the flagship is 20x20
# @ 640/32) — so token_prune_layer in {4, 6, 8} x keep in {75%, 50%,
# 25%} is measured where the serving lever would actually run, not in
# the shallow/coarse regime where it is known to collapse (ROADMAP
# "Token pruning").  Same data/recipe as converge_synth_prune.py.
# Generate data first:
#   python tools/make_synth_data.py --root /tmp/synth_conv_r2 \
#       --n-train 128 --n-val 32
dataset = "RefCOCOUNC"
max_token = 10
img_size = 160

ema = True
ema_factor = 0.999
use_bf16 = False
seed = 6666
log_interval = 16
evaluate_interval = 40
start_evaluate_epoch = 0
save_interval = -1

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=max_token,
         with_bbox=True, dataset=dataset, use_token_type="beit3"),
    dict(type="LargeScaleJitter", out_max_size=img_size, jitter_min=0.3,
         jitter_max=1.4),
    dict(type="Resize", img_scale=(img_size, img_size), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData",
         keys=["img", "ref_expr_inds", "gt_bbox", "text_attention_mask"]),
]
val_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=max_token,
         with_bbox=True, dataset=dataset, use_token_type="beit3"),
    dict(type="Resize", img_scale=(img_size, img_size), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData",
         keys=["img", "ref_expr_inds", "gt_bbox", "text_attention_mask"]),
]

data_root = "/tmp/synth_conv_r2/"
data = dict(
    samples_per_gpu=16,
    workers_per_gpu=2,
    train=dict(
        type=dataset, which_set="train", img_source=["coco"],
        annsfile=data_root + "instances.json",
        imgsfile=data_root + "images",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset, which_set="val", img_source=["coco"],
        annsfile=data_root + "instances.json",
        imgsfile=data_root + "images",
        pipeline=val_pipeline,
    ),
)

model = dict(
    type="MIXDETRMB",
    vis_enc=dict(
        type="BEIT3", img_size=img_size, patch_size=8, vit_type="base",
        drop_path_rate=0.0, vocab_size=64010, pretrain=None,
        embed_dim=64, num_heads=4, ffn_dim=128, num_layers=12,
    ),
    lan_enc=None,
    fusion=None,
    head=dict(
        type="TextGuidedQuerySelectKDDETRHead",
        num_queries=1, text_max_token=max_token, in_channels=64,
        embed_dim=64, num_classes=1, num_decoder_layers=2,
        only_decoder=True,
        branch_loss_weight={"decoder": 1.0,
                            "balanced_distill": {"token": 2.0,
                                                 "distill": 1.0}},
        distill_type="hard_weighted",
        prepare_target_mode="score_iou_weighted",
        num_token_mlp_layers=1,
        text_guided_query_generation=True,
        num_tgqg_layers=1,
    ),
)

grad_norm_clip = 0.15
lr = 0.001
optimizer_config = dict(type="Adam", lr=lr, lr_vis_enc=lr / 10.0,
                        lr_lan_enc=lr, betas=(0.9, 0.98), eps=1e-9,
                        weight_decay=0, amsgrad=True)
scheduler_config = dict(type="MultiStepLRWarmUp", warmup_epochs=1,
                        decay_steps=[350], decay_ratio=0.1,
                        max_epoch=400)
