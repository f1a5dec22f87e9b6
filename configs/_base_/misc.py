# Global defaults (mirrors /root/reference/configs/_base_/misc.py:1-16)
ema = True
ema_factor = 0.999
use_fp16 = False          # legacy flag; TPU path uses use_bf16 below
use_bf16 = True           # bfloat16 compute on TPU
seed = 6666
deterministic = True
log_level = "INFO"
log_interval = 50
save_interval = -1
resume_from = None
load_from = None
finetune_from = None
evaluate_interval = 1
start_evaluate_epoch = 0
