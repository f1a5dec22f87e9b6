# Two-stage training, stage 2: add balanced distillation, start from
# stage-1 weights (reference refcoco_twostage_2.py deltas)
_base_ = ["./refcocog_google_onestage.py"]
lr = 0.0003
optimizer_config = dict(lr=lr, lr_vis_enc=lr / 10.0, lr_lan_enc=lr)
scheduler_config = dict(decay_steps=[15], max_epoch=20)
load_from = "stage1_ckpt_path"
