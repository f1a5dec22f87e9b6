# Two-stage distillation proof at the big tier, stage 2: balanced
# distill from stage-1 weights, lr 0.6x, ema off (reference twostage_2
# regime, configs/single/ViT-base/refcoco/refcoco_twostage_2.py).
# Launch with: --load-from work_dir/converge_big_s1/latest
_base_ = ["./converge_synth_big.py"]

ema = False
lr = 0.0003
optimizer_config = dict(lr=lr, lr_vis_enc=lr, lr_lan_enc=lr)
scheduler_config = dict(warmup_epochs=3, decay_steps=[120],
                        decay_ratio=0.1, max_epoch=150)
