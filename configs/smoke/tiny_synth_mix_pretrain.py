# Mixed-pretraining smoke (reference pretrain regime,
# configs/mix/ViT-base/pretrian-mixed.py:73-140): Mixed multi-source
# dataset with per-source image roots + img_source filtering,
# decoder-only branch loss, sub-validation split val_refcoco_unc.
# Data: tests/util_synth.make_mixed_style(/tmp/simvg_mix_synth).
# Finetuning then starts from this run's checkpoint via
# --finetune-from (tiny_synth.py + load non-strict).
_base_ = ["./tiny_synth.py"]

dataset = "Mixed"
max_token = 10
img_size = 64

ema = False

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

data_root = "/tmp/simvg_mix_synth/"
imgsfile = {
    "coco": data_root + "coco",
    "flickr": data_root + "flickr",
}
data = dict(
    _delete_=True,
    # 1 per chip: the suite runs on 8 virtual devices and the synthetic
    # Mixed train split has only 8 surviving samples (drop_last)
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type=dataset, which_set="train",
        # "visual-genome" records exist in the annotations but are NOT
        # in img_source: the filter must drop them (their images are
        # deliberately absent on disk)
        img_source=["coco", "flickr"],
        annsfile=data_root + "instances.json",
        imgsfile=imgsfile,
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset, which_set="val_refcoco_unc",
        img_source=["coco"],
        annsfile=data_root + "instances.json",
        imgsfile=imgsfile,
        pipeline=val_pipeline,
    ),
)

# pretrain regime: decoder-only loss (pretrian-mixed.py:81)
model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
