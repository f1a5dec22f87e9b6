# Two-stage smoke, stage 1: decoder-only + EMA
_base_ = ["./tiny_synth.py"]
model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
ema = True
