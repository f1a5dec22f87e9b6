# Finetune on refcoco+ from the Mixed pretrain: decoder branch only,
# short schedule (reference configs/mix/ViT-base/finetune_mix/
# noema#finetune#refcoco+.py: lr 0.0001, decay [8], 10 epochs, no EMA)
_base_ = ["../../../single/ViT-base/refcocoplus/refcocoplus_onestage.py"]
model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
ema = False
lr = 0.0001
optimizer_config = dict(lr=lr, lr_vis_enc=lr / 10.0, lr_lan_enc=lr)
scheduler_config = dict(decay_steps=[8], max_epoch=10)
finetune_from = "pretrain_ckpt_path"
