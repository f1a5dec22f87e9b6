# ViT-large/32 @640 (reference configs/single/ViT-large/refcocoggoogle/
# refcocoggoogle_onestage.py deltas vs ViT-base: bs4, large encoder,
# in_channels 1024, distill weights token 1.0 / distill 0.4)
_base_ = ["../../ViT-base/refcocog_google/refcocog_google_onestage.py"]
data = dict(samples_per_gpu=4, workers_per_gpu=4)
model = dict(
    vis_enc=dict(
        vit_type="large",
        # memory-safe recipe for ViT-L (not the inherited r4 unrolled
        # no-remat ViT-base recipe): see refcoco_onestage.py note
        scan_layers=True,
        remat=True,
        pretrain="pretrain_weights/beit3_large_patch16_224.zip",
    ),
    head=dict(
        in_channels=1024,
        branch_loss_weight={
            "decoder": 1.0,
            "balanced_distill": {"token": 1.0, "distill": 0.4},
        },
    ),
)
