# ViT-large/32 @640 (reference configs/single/ViT-large/refcoco/
# refcoco_onestage.py deltas vs ViT-base: bs4, large encoder,
# in_channels 1024, distill weights token 1.0 / distill 0.4)
_base_ = ["../../ViT-base/refcoco/refcoco_onestage.py"]
data = dict(samples_per_gpu=4, workers_per_gpu=4)
model = dict(
    vis_enc=dict(
        vit_type="large",
        pretrain="pretrain_weights/beit3_large_patch16_224.zip",
        # ViT-L stays on the memory-safe recipe: ~680M params of f32
        # amsgrad+EMA state already crowd 16G HBM, and 24 unrolled
        # layers blow up tunnel compile time.  The r4 unrolled
        # no-remat recipe (ViT-base, ROADMAP "Training floor") is NOT
        # inherited.
        scan_layers=True,
        remat=True,
    ),
    head=dict(
        in_channels=1024,
        branch_loss_weight={
            "decoder": 1.0,
            "balanced_distill": {"token": 1.0, "distill": 0.4},
        },
    ),
)
