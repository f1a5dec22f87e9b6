# Two-stage distillation on refcoco+ from the coco-all-pretrain stage-1
# weights (reference configs/mix/ViT-base/two-stage_distill_coco_all/
# noema#finetune#refcoco+.py: balanced distill token 1.0 / distill 0.4, lr 3e-4,
# decay [15], 20 epochs, no EMA)
_base_ = ["../../../single/ViT-base/refcocoplus/refcocoplus_onestage.py"]
model = dict(head=dict(branch_loss_weight={
    "decoder": 1.0,
    "balanced_distill": {"token": 1.0, "distill": 0.4},
}))
ema = False
lr = 0.0003
optimizer_config = dict(lr=lr, lr_vis_enc=lr / 10.0, lr_lan_enc=lr)
scheduler_config = dict(decay_steps=[15], max_epoch=20)
finetune_from = "stage1_ckpt_path"
