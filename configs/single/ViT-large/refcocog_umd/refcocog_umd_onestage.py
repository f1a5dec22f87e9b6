# ViT-large/32 variant (reference configs/single/ViT-large)
_base_ = ["../../ViT-base/refcocog_umd/refcocog_umd_onestage.py"]
model = dict(
    vis_enc=dict(
        vit_type="large",
        pretrain="pretrain_weights/beit3_large_patch16_224.zip",
    ),
    head=dict(in_channels=1024),
)
