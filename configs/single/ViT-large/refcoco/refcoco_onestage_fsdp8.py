# ViT-large/32 @640 on an 8-chip pod slice (e.g. v5e-8) with
# FSDP/ZeRO: the comment in refcoco_onestage.py notes that ~680M
# params of f32 amsgrad + EMA state crowd a single 16G chip; sharding
# that state over the 8-way data axis (parallel/mesh.py
# param_partition_spec) cuts the per-chip optimizer footprint to
# ~1/8, leaving headroom to drop remat (the r4 "Training floor"
# recipe) if compile times allow.  Global batch = 8 chips x spg.
_base_ = ["refcoco_onestage.py"]
fsdp = True
# model_parallel stays 1: ViT-L activations fit per-chip; pure-DP
# FSDP keeps the all-gathers on the fastest collective path.
model_parallel = 1
