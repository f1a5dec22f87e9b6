# Stage 2 (ViT-large): balanced distillation from stage-1 weights
# (reference ViT-large/refcoco/refcoco_twostage_2.py: lr 1e-4, no warmup,
# decay [7], 10 epochs)
_base_ = ["./refcoco_onestage.py"]
lr = 0.0001
optimizer_config = dict(lr=lr, lr_vis_enc=lr / 10.0, lr_lan_enc=lr)
scheduler_config = dict(warmup_epochs=0, decay_steps=[7], max_epoch=10)
load_from = "stage1_ckpt_path"
