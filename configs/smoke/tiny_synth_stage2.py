# Two-stage smoke, stage 2: balanced distill from stage-1 weights
_base_ = ["./tiny_synth.py"]
load_from = "work_dir/smoke_s1/latest"
