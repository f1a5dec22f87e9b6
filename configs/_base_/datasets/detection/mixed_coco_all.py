# Mixed pretraining restricted to COCO-sourced images only
# (reference configs/_base_/datasets/detection/mixed_coco_all.py:
# same as mixed.py but img_source=["coco"] and coco-only roots).
dataset = "Mixed"
data_root = "./data/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=20,
         with_bbox=True, dataset="Mixed", use_token_type="beit3"),
    dict(type="LargeScaleJitter", out_max_size=640, jitter_min=0.3,
         jitter_max=1.4),
    dict(type="Resize", img_scale=(640, 640), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData",
         keys=["img", "ref_expr_inds", "gt_bbox", "text_attention_mask"]),
]
val_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=20,
         with_bbox=True, dataset="Mixed", use_token_type="beit3"),
    dict(type="Resize", img_scale=(640, 640), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData",
         keys=["img", "ref_expr_inds", "gt_bbox", "text_attention_mask"]),
]

imgsfile = {
    "coco": data_root + "images/mscoco/train2014",
    "flickr": data_root + "images/flickr30k",
    "saiaprtc12": data_root + "images/saiaprtc12",
    "visual-genome": data_root + "images/visual-genome",
}

data = dict(
    samples_per_gpu=32,
    workers_per_gpu=8,
    train=dict(
        type=dataset, which_set="train",
        img_source=["coco"],
        annsfile=data_root + "annotations/mixed/instances.json",
        imgsfile=imgsfile,
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset, which_set="val_refcoco_unc",
        img_source=["coco"],
        annsfile=data_root + "annotations/mixed/instances.json",
        imgsfile=imgsfile,
        pipeline=val_pipeline,
    ),
)
