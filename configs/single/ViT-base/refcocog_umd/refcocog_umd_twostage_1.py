# Two-stage training, stage 1: decoder branch only, EMA on
# (reference refcoco_twostage_1.py deltas: bs16, decoder-only loss, ema)
_base_ = ["./refcocog_umd_onestage.py"]
data = dict(samples_per_gpu=16)
model = dict(head=dict(branch_loss_weight=dict(_delete_=True, decoder=1.0)))
ema = True
