# RefCOCO (UNC split) data config
# (key surface mirrors /root/reference/configs/_base_/datasets/detection/
# refcoco-unc.py)
dataset = "ReferItGameBerkeley"
data_root = "./data/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=15,
         with_bbox=True, dataset="ReferItGameBerkeley"),
    dict(type="LargeScaleJitter", out_max_size=512, jitter_min=0.3,
         jitter_max=1.4),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData", keys=["img", "ref_expr_inds", "gt_bbox"]),
]
val_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=15,
         with_bbox=True, dataset="ReferItGameBerkeley"),
    dict(type="Resize", img_scale=(512, 512), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData", keys=["img", "ref_expr_inds", "gt_bbox"]),
]
test_pipeline = list(val_pipeline)

data = dict(
    samples_per_gpu=64,
    workers_per_gpu=4,
    train=dict(
        type=dataset,
        which_set="train",
        img_source=["saiaprtc12"],
        annsfile=data_root + "annotations/referitgame-berkeley/instances.json",
        imgsfile=data_root + "images/saiaprtc12",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset,
        which_set="val",
        img_source=["saiaprtc12"],
        annsfile=data_root + "annotations/referitgame-berkeley/instances.json",
        imgsfile=data_root + "images/saiaprtc12",
        pipeline=val_pipeline,
    ),
    test=dict(
        type=dataset,
        which_set="test",
        img_source=["saiaprtc12"],
        annsfile=data_root + "annotations/referitgame-berkeley/instances.json",
        imgsfile=data_root + "images/saiaprtc12",
        pipeline=test_pipeline,
    ),
)
