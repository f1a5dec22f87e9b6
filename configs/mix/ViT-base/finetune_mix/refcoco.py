# Finetune on RefCOCO from the Mixed pretrain
# (reference configs/mix/ViT-base/finetune_mix)
_base_ = ["../../../single/ViT-base/refcoco/refcoco_onestage.py"]
lr = 0.0003
optimizer_config = dict(lr=lr, lr_vis_enc=lr / 10.0, lr_lan_enc=lr)
scheduler_config = dict(decay_steps=[15], max_epoch=20)
finetune_from = "mixed_pretrain_ckpt_path"
