# GRefCOCO stage 2: balanced distillation from stage-1, 100 epochs
# (reference ViT-base/grefcoco/grefcoco_twostage_2.py)
_base_ = ["./grefcoco_onestage.py"]
scheduler_config = dict(max_epoch=100)
load_from = "stage1_ckpt_path"
