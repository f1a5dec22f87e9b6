# RefCOCO (UNC split), VGTR-era augmentation recipe.
#
# Counterpart of /root/reference/configs/_base_/datasets/detection/
# refcoco-unc_vgtr.py.  The reference file declares type='VGTRDataset'
# with a raw ln_data/split_root layout, but NO VGTRDataset class exists
# anywhere in the reference source tree (grep simvg/datasets/) — it is
# a dead legacy base kept from the VGTR/SeqTR era.  We keep the file
# for config-tree parity and map it onto the working equivalents: the
# RefCOCOUNC dataset with the VGTRAugment train pipeline
# (simvg_tpu/data/vgtr_aug.py, reference
# simvg/datasets/pipelines/vgtr_aug.py:16-62), imsize 512 and
# max_query_len 20 as in the reference keys.
dataset = "RefCOCOUNC"
data_root = "./data/"
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

# augment=True in the reference -> the VGTR augmentation suite
# (random affine + horizontal flip with left/right text rewrite +
# color jitter), then fixed-size resize like VGTR's letterbox-free
# testmode=False path.
train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=20,
         with_bbox=True, dataset="RefCOCOUNC"),
    dict(type="VGTRAugment", img_size=512),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData", keys=["img", "ref_expr_inds", "gt_bbox"]),
]
# augment=False in the reference val split.
val_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=20,
         with_bbox=True, dataset="RefCOCOUNC"),
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
        img_source=["coco"],
        annsfile=data_root + "annotations/refcoco-unc/instances.json",
        imgsfile=data_root + "images/mscoco/train2014",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset,
        which_set="val",
        img_source=["coco"],
        annsfile=data_root + "annotations/refcoco-unc/instances.json",
        imgsfile=data_root + "images/mscoco/train2014",
        pipeline=val_pipeline,
    ),
)
