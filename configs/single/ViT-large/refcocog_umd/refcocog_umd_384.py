# BEiT3-large @ 384px with text pad-length buckets: the long-expression
# eval configuration (BASELINE config #3 — RefCOCOg has the longest
# expressions; buckets keep short ones cheap).
_base_ = ["./refcocog_umd_onestage.py"]
dataset = "RefCOCOgUMD"
img_size = 384
max_token = 40
text_buckets = [20, 40]

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
test_pipeline = list(val_pipeline)

data = dict(
    train=dict(pipeline=train_pipeline),
    val=dict(pipeline=val_pipeline),
    test=dict(pipeline=test_pipeline),
)

model = dict(vis_enc=dict(img_size=img_size))
