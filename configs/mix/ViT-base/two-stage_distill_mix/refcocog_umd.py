# Two-stage distillation on refcocog-umd from the Mixed-pretrain stage-1
# weights (reference configs/mix/ViT-base/two-stage_distill_mix/
# noema#finetune#refcocog-umd.py: balanced distill token 2.0 / distill 1.0, lr 3e-4,
# decay [10], 15 epochs, no EMA)
_base_ = ["../../../single/ViT-base/refcocog_umd/refcocog_umd_onestage.py"]
model = dict(head=dict(branch_loss_weight={
    "decoder": 1.0,
    "balanced_distill": {"token": 2.0, "distill": 1.0},
}))
ema = False
lr = 0.0003
optimizer_config = dict(lr=lr, lr_vis_enc=lr / 10.0, lr_lan_enc=lr)
scheduler_config = dict(decay_steps=[10], max_epoch=15)
finetune_from = "stage1_ckpt_path"
