# Synthetic convergence proof config (README "synthetic convergence"):
# 128 non-square (120x160) images resized to a 128x128 canvas, so eval
# runs with anisotropic non-unit scale_factor — regression territory of
# the round-1 eval rescale bug. Generate data first:
#   python tools/make_synth_data.py --root /tmp/synth_converge2 \
#       --n-train 128 --n-val 32
dataset = "RefCOCOUNC"
max_token = 10
img_size = 128

ema = False
use_bf16 = False
seed = 6666
log_interval = 4
evaluate_interval = 10
start_evaluate_epoch = 0
save_interval = -1

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=max_token,
         with_bbox=True, dataset=dataset, use_token_type="beit3"),
    dict(type="LargeScaleJitter", out_max_size=img_size, jitter_min=0.5,
         jitter_max=1.3),
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

data_root = "/tmp/synth_converge2/"
data = dict(
    samples_per_gpu=16,
    workers_per_gpu=2,
    train=dict(type=dataset, which_set="train", img_source=["coco"],
               annsfile=data_root + "instances.json",
               imgsfile=data_root + "images", pipeline=train_pipeline),
    val=dict(type=dataset, which_set="val", img_source=["coco"],
             annsfile=data_root + "instances.json",
             imgsfile=data_root + "images", pipeline=val_pipeline),
)

model = dict(
    type="MIXDETRMB",
    vis_enc=dict(
        type="BEIT3", img_size=img_size, patch_size=16, vit_type="base",
        drop_path_rate=0.0, vocab_size=64010, pretrain=None,
        embed_dim=128, num_heads=8, ffn_dim=256, num_layers=4,
    ),
    lan_enc=None,
    fusion=None,
    head=dict(
        type="TextGuidedQuerySelectKDDETRHead",
        num_queries=1, text_max_token=max_token,
        in_channels=128, embed_dim=128, num_classes=1,
        num_decoder_layers=2, only_decoder=True,
        branch_loss_weight={"decoder": 1.0,
                            "balanced_distill": {"token": 2.0,
                                                 "distill": 1.0}},
        distill_type="hard_weighted",
        prepare_target_mode="score_iou_weighted",
        num_token_mlp_layers=1,
        text_guided_query_generation=True, num_tgqg_layers=1,
        attn_dropout=0.0, ffn_dropout=0.0,
    ),
)

grad_norm_clip = 0.15
lr = 0.0005
optimizer_config = dict(type="Adam", lr=lr, lr_vis_enc=lr,
                        lr_lan_enc=lr, betas=(0.9, 0.98), eps=1e-9,
                        weight_decay=0, amsgrad=True)
scheduler_config = dict(type="MultiStepLRWarmUp", warmup_epochs=5,
                        decay_steps=[120], decay_ratio=0.1,
                        max_epoch=150)
