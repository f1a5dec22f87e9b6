# GRefCOCO smoke config: multi-target/no-target path end-to-end.
_base_ = ["./tiny_synth.py"]

dataset = "GRefCOCO"
max_gt = 4

data_root = "/tmp/simvg_tpu_synth_grec/"
data = dict(
    train=dict(type=dataset, annsfile=data_root + "instances.json",
               imgsfile=data_root + "images"),
    val=dict(type=dataset, annsfile=data_root + "instances.json",
             imgsfile=data_root + "images"),
)

model = dict(head=dict(num_queries=10))
