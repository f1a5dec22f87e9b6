# Tiny SeqTR-style smoke config: OneStageModel composition (zoo
# vis_enc + LSTM lan_enc + cross-attention fusion + plain DETR head —
# reference simvg/models/det_seg/one_stage.py) on the synthetic
# RefCOCO-style data from tests/util_synth.py.  Drives the legacy
# family through config-facing tools (vis_cam GradCAM_SeqTR pathway,
# parameters.py, ...) on CPU in seconds.
dataset = "RefCOCOUNC"
max_token = 10
img_size = 64

ema = False
use_bf16 = False
seed = 6666
log_interval = 1
evaluate_interval = 1
start_evaluate_epoch = 0
save_interval = -1

img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375])

# legacy tokenization: "default" builds the word vocab from the
# annotations themselves (reference GloVe pipeline minus the cached
# embedding files — datasets.py build_word_vocab)
train_pipeline = [
    dict(type="LoadImageAnnotationsFromFile", max_token=max_token,
         with_bbox=True, dataset=dataset, use_token_type="default"),
    dict(type="Resize", img_scale=(img_size, img_size), keep_ratio=False),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="CollectData",
         keys=["img", "ref_expr_inds", "gt_bbox", "text_attention_mask"]),
]
val_pipeline = list(train_pipeline)

data_root = "/tmp/simvg_tpu_synth/"
data = dict(
    samples_per_gpu=4,
    workers_per_gpu=2,
    train=dict(
        type=dataset, which_set="train", img_source=["coco"],
        annsfile=data_root + "instances.json",
        imgsfile=data_root + "images",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset, which_set="val", img_source=["coco"],
        annsfile=data_root + "instances.json",
        imgsfile=data_root + "images",
        pipeline=val_pipeline,
    ),
)

model = dict(
    type="OneStageModel",
    vis_enc=dict(
        type="DarkNet53",
        stage_blocks=(1, 1, 1, 1, 1),
        stage_widths=(8, 8, 8, 16, 16),
    ),
    lan_enc=dict(
        type="LSTM",
        vocab_size=1000,
        word_emb_dim=16,
        hidden_size=8,
    ),
    fusion=dict(type="SimpleFusionv2", embed_dim=16, num_heads=2),
    head=dict(
        type="DETRHead",
        num_queries=3,
        in_channels=16,
        embed_dim=16,
        num_classes=1,
        num_encoder_layers=1,
        num_decoder_layers=1,
        attn_dropout=0.0,
        ffn_dropout=0.0,
        branch_loss_weight={"decoder": 1.0},
    ),
)

grad_norm_clip = 0.15
lr = 0.001
optimizer_config = dict(type="Adam", lr=lr, lr_vis_enc=lr / 10.0,
                        lr_lan_enc=lr, betas=(0.9, 0.98), eps=1e-9,
                        weight_decay=0, amsgrad=True)
scheduler_config = dict(type="MultiStepLRWarmUp", warmup_epochs=1,
                        decay_steps=[25], decay_ratio=0.1, max_epoch=2)
