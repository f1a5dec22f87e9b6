# GRefCOCO stage 1: decoder branch only
# (reference ViT-base/grefcoco/grefcoco_twostage_1.py)
_base_ = ["./grefcoco_onestage.py"]
model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
