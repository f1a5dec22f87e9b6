# Token-branch capacity diagnostic (VERDICT r4 #2): train with the
# token branch's GT loss ONLY (branch_loss_weight={"token": 1.0}) on
# the synthetic convergence set.  If the token branch cannot fit the
# train set with an undiluted loss, the ceiling is the CLS-token
# pathway's capacity in the tiny encoder, not the distillation
# schedule — and no distill regime can lift it past that ceiling.
# Reference semantics: tgqs_kd_detr_head.py:515-524 ("token" key).
_base_ = ["./converge_synth.py"]

model = dict(head=dict(branch_loss_weight=dict(_delete_=True,
                                               token=1.0)))
