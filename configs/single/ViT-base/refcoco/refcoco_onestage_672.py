# Perf-lever variant (VERDICT r2 #3): img_size=672 -> 21x21 patch grid
# (441 + 1 CLS + 20 text = 462-token sequence).  Identical training
# recipe to refcoco_onestage.py otherwise; the checkpoint loader's
# pos-embed bicubic interpolation targets the 21x21 grid automatically
# (tools/convert_checkpoint.interpolate_pos_embed sizes from the param
# table, reference semantics beit3.py:115-159).  Measured in bench.py
# extra as img672_images_per_sec_per_chip.
_base_ = ["refcoco_onestage.py"]

img_size = 672

# re-stated pipelines: the _base_ pipelines bake img_size=640 into
# their op dicts, so override them wholesale at 672
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])
train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=20,
         with_bbox=True, dataset="RefCOCOUNC", use_token_type="beit3"),
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
    dict(type="LoadImageAnnotationsFromFile", max_token=20,
         with_bbox=True, dataset="RefCOCOUNC", use_token_type="beit3"),
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
    testA=dict(pipeline=test_pipeline),
    testB=dict(pipeline=test_pipeline),
)

model = dict(vis_enc=dict(img_size=img_size))
