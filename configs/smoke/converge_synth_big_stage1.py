# Two-stage distillation proof at the big tier, stage 1: decoder-only
# + EMA (reference twostage_1 regime,
# configs/single/ViT-base/refcoco/refcoco_twostage_1.py).
_base_ = ["./converge_synth_big.py"]

model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
ema = True
