# Two-stage distillation proof, stage 2: balanced distill from stage-1
# weights (reference twostage_2 regime: lr 0.6x, ema OFF (twostage_2
# has ema=False vs stage 1's True), balanced_distill on,
# load_from=stage1 — configs/single/ViT-base/refcoco/refcoco_twostage_2.py
# diffs vs twostage_1: branch_loss_weight/lr/decay/max_epoch/load_from).
# Launch with: --load-from work_dir/converge_s1/latest
_base_ = ["./converge_synth.py"]

ema = False
lr = 0.0003
optimizer_config = dict(lr=lr, lr_vis_enc=lr, lr_lan_enc=lr)
scheduler_config = dict(warmup_epochs=3, decay_steps=[120],
                        decay_ratio=0.1, max_epoch=150)
