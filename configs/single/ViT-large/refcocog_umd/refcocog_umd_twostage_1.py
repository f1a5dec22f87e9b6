# Stage 1 (ViT-large): decoder branch only, no EMA, two-step decay
# (reference ViT-large/refcocog/refcocog_twostage_1.py)
_base_ = ["./refcocog_umd_onestage.py"]
model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               decoder=1.0)))
scheduler_config = dict(decay_steps=[21, 27])
