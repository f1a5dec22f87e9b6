# Two-stage distillation proof, stage 1: decoder-only + EMA
# (reference twostage_1 regime: branch_loss_weight={"decoder":1.0},
# ema=True — configs/single/ViT-base/refcoco/refcoco_twostage_1.py).
# Same data/model/schedule as converge_synth.py so stage-2 numbers are
# comparable with the onestage baseline (README "synthetic convergence").
_base_ = ["./converge_synth.py"]

model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
ema = True
