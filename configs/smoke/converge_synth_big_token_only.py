# Token-branch capacity diagnostic at the big tier (VERDICT r4 #2):
# same undiluted token-GT-only regime as converge_synth_token_only.py
# but on the 8-layer/256-dim encoder and 512-image set, where the CLS
# pathway has enough capacity to carry geometry.  This is the ceiling
# the two-stage distillation result is judged against: distillation is
# "working" if stage-2 token accuracy approaches (or beats) what the
# token branch reaches when it gets the whole model to itself.
# Reference semantics: tgqs_kd_detr_head.py:515-524 ("token" key).
_base_ = ["./converge_synth_big.py"]

model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               token=1.0)))
