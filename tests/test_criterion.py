"""Criterion parity tests.

Oracle: an independent numpy/scipy implementation of the reference's
ragged-list loss semantics (simvg/core/criterion/criterion.py +
tgqs_kd_detr_head.py prepare/soft-target logic), written from the spec.
Our batched/padded jnp criterion must agree on random problems with
variable per-sample target counts.
"""

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from simvg_tpu.losses.criterion import (
    Targets,
    prepare_soft_targets,
    set_criterion,
    simvg_branch_losses,
)


# ---------------------------------------------------------------- oracle

def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def pair_giou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / union
    lt2 = np.minimum(a[:, None, :2], b[None, :, :2])
    rb2 = np.maximum(a[:, None, 2:], b[None, :, 2:])
    wh2 = np.clip(rb2 - lt2, 0, None)
    hull = wh2[..., 0] * wh2[..., 1]
    return iou - (hull - union) / hull


def oracle_match(logits, boxes, tgt_labels, tgt_boxes):
    """detrex ce_cost matcher per sample."""
    prob = softmax(logits)
    cc = -prob[:, tgt_labels]
    cb = np.abs(boxes[:, None, :] - tgt_boxes[None, :, :]).sum(-1)
    cg = -pair_giou(cxcywh_to_xyxy(boxes), cxcywh_to_xyxy(tgt_boxes))
    cost = 1 * cc + 5 * cb + 2 * cg
    return linear_sum_assignment(cost)


def oracle_set_criterion(all_logits, all_boxes, tgts, num_classes=1,
                         eos_coef=0.1, loss_class_type="ce_loss",
                         weights=(1.0, 5.0, 2.0)):
    """Reference SetCriterion semantics on ragged targets.

    tgts: list of dicts {labels [n], boxes [n,4], weight [n] (optional)}.
    Returns weighted total across layers (aux included).
    """
    L, B, Q, _ = all_logits.shape
    num_boxes = max(sum(len(t["labels"]) for t in tgts), 1)
    total = 0.0
    for layer in range(L):
        logits, boxes = all_logits[layer], all_boxes[layer]
        ce_terms_num, ce_terms_den = 0.0, 0.0
        wce_total = 0.0
        l1_total, giou_total = 0.0, 0.0
        for b in range(B):
            t = tgts[b]
            n = len(t["labels"])
            if n > 0:
                rows, cols = oracle_match(logits[b], boxes[b],
                                          t["labels"], t["boxes"])
            else:
                rows, cols = np.array([], int), np.array([], int)
            tgt_cls = np.full(Q, num_classes, int)
            tgt_cls[rows] = t["labels"][cols]
            logp = np.log(softmax(logits[b]))
            nll = -logp[np.arange(Q), tgt_cls]
            cw = np.where(tgt_cls == num_classes, eos_coef, 1.0)
            if loss_class_type == "ce_loss":
                ce_terms_num += (cw * nll).sum()
                ce_terms_den += cw.sum()
            else:  # weighted_ce_loss (reference's target-index quirk)
                qw = np.full(Q, 0.1)
                qw[cols] = 1.0  # NOTE: target indices, as in reference
                wce_total += (qw * (cw * nll)).mean()
            src = boxes[b][rows]
            tb = t["boxes"][cols]
            l1 = np.abs(src - tb).sum(-1)
            g = 1 - np.diag(pair_giou(cxcywh_to_xyxy(src),
                                      cxcywh_to_xyxy(tb)))
            if loss_class_type == "weighted_ce_loss":
                pw = t["weight"][cols]
                l1 = l1 * pw
                g = g * pw
            l1_total += l1.sum()
            giou_total += g.sum()
        if loss_class_type == "ce_loss":
            lc = ce_terms_num / ce_terms_den
        else:
            lc = wce_total
        total += (weights[0] * lc + weights[1] * l1_total / num_boxes
                  + weights[2] * giou_total / num_boxes)
    return total


def _rand_problem(rng, L=2, B=3, Q=5, Tm=3, C=1):
    logits = rng.normal(size=(L, B, Q, C + 1)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.8, (L, B, Q, 4)).astype(np.float32)
    boxes[..., 2:] = rng.uniform(0.05, 0.2, (L, B, Q, 2))
    counts = rng.integers(1, Tm + 1, B)
    tgt_boxes = np.zeros((B, Tm, 4), np.float32)
    tgt_labels = np.zeros((B, Tm), np.int64)
    valid = np.zeros((B, Tm), bool)
    ragged = []
    for b in range(B):
        n = counts[b]
        tb = np.stack(
            [
                rng.uniform(0.3, 0.7, n),
                rng.uniform(0.3, 0.7, n),
                rng.uniform(0.05, 0.3, n),
                rng.uniform(0.05, 0.3, n),
            ],
            -1,
        ).astype(np.float32)
        tgt_boxes[b, :n] = tb
        valid[b, :n] = True
        ragged.append({"labels": np.zeros(n, int), "boxes": tb,
                       "weight": np.ones(n, np.float32)})
    targets = Targets(
        labels=jnp.asarray(tgt_labels, jnp.int32),
        boxes=jnp.asarray(tgt_boxes),
        valid=jnp.asarray(valid),
        weight=jnp.ones((B, Tm), jnp.float32),
    )
    return logits, boxes, targets, ragged


def test_set_criterion_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        logits, boxes, targets, ragged = _rand_problem(rng)
        ours = set_criterion(jnp.asarray(logits), jnp.asarray(boxes),
                             targets)
        oracle = oracle_set_criterion(logits, boxes, ragged)
        np.testing.assert_allclose(float(ours["total"]), oracle,
                                   rtol=2e-4, atol=2e-4)


def test_set_criterion_single_query_single_target():
    """num_queries=1 (the RefCOCO config) reduces to direct supervision."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(1, 2, 1, 2)).astype(np.float32)
    boxes = np.full((1, 2, 1, 4), 0.5, np.float32)
    tgt = Targets(
        labels=jnp.zeros((2, 1), jnp.int32),
        boxes=jnp.asarray(np.full((2, 1, 4), 0.5, np.float32)),
        valid=jnp.ones((2, 1), bool),
        weight=jnp.ones((2, 1), jnp.float32),
    )
    out = set_criterion(jnp.asarray(logits), jnp.asarray(boxes), tgt)
    # perfect boxes -> zero box losses
    np.testing.assert_allclose(float(out["loss_bbox"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(out["loss_giou"]), 0.0, atol=1e-6)


def test_prepare_soft_targets_score_iou():
    rng = np.random.default_rng(2)
    logits, boxes, targets, ragged = _rand_problem(rng, L=1)
    tp, wd = prepare_soft_targets(
        jnp.asarray(logits[0]), jnp.asarray(boxes[0]), targets
    )
    tp_valid = np.asarray(tp.valid)
    # every valid GT of class 0 should be matched (Q >= T)
    assert tp_valid.sum() == np.asarray(targets.valid).sum()
    # oracle: match teacher to gt, weight = P(cls0)*iou
    w_all = []
    for b, t in enumerate(ragged):
        rows, cols = oracle_match(logits[0][b], boxes[0][b], t["labels"],
                                  t["boxes"])
        sc = softmax(logits[0][b])[:, 0]
        pb = boxes[0][b][rows]
        gb = t["boxes"][cols]
        area = lambda x: cxcywh_to_xyxy(x)
        a, bb = area(pb), area(gb)
        lt = np.maximum(a[:, :2], bb[:, :2])
        rb = np.minimum(a[:, 2:], bb[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        ua = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
              + (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]) - inter)
        w_all.extend((sc[rows] * inter / ua).tolist())
    np.testing.assert_allclose(float(wd), np.mean(w_all), rtol=1e-4,
                               atol=1e-5)


def test_balanced_distill_pipeline_runs():
    rng = np.random.default_rng(3)
    logits, boxes, targets, _ = _rand_problem(rng, L=3)
    head_out = {
        "class_decoder": jnp.asarray(logits),
        "bbox_decoder": jnp.asarray(boxes),
        "class_token": jnp.asarray(logits[-1:]),
        "bbox_token": jnp.asarray(boxes[-1:]),
    }
    out = simvg_branch_losses(
        head_out,
        targets,
        branch_loss_weight={"decoder": 1.0,
                            "balanced_distill": {"token": 2.0,
                                                 "distill": 1.0}},
    )
    assert set(out) >= {"loss_dgt", "loss_tgt", "loss_kd", "loss_total",
                        "loss_distill_w"}
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    # total = sum of branches
    np.testing.assert_allclose(
        float(out["loss_total"]),
        float(out["loss_dgt"]) + float(out["loss_tgt"])
        + float(out["loss_kd"]),
        rtol=1e-5,
    )


def oracle_soft_targets_and_weighted_loss(t_logits, t_boxes, s_logits,
                                          s_boxes, ragged):
    """Reference semantics: match teacher to GT (score_iou_weighted),
    build teacher targets, then weighted_ce SetCriterion on the student
    (tgqs_kd_detr_head.py:248-268 + criterion.py weighted paths)."""
    B, Q, _ = t_logits.shape
    tgts = []
    for b in range(B):
        t = ragged[b]
        rows, cols = oracle_match(t_logits[b], t_boxes[b], t["labels"],
                                  t["boxes"])
        score = softmax(t_logits[b])[:, 0]
        pb = t_boxes[b][rows]
        gb = t["boxes"][cols]
        a, bb = cxcywh_to_xyxy(pb), cxcywh_to_xyxy(gb)
        lt = np.maximum(a[:, :2], bb[:, :2])
        rb = np.minimum(a[:, 2:], bb[:, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        ua = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
              + (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1]) - inter)
        w = score[rows] * inter / ua
        # order pairs by GT slot (our padded layout); equivalent set
        order = np.argsort(cols)
        tgts.append({"labels": np.zeros(len(rows), int),
                     "boxes": pb[order], "weight": w[order]})
    return oracle_set_criterion(s_logits, s_boxes, tgts,
                                loss_class_type="weighted_ce_loss")


def test_hard_weighted_distill_matches_oracle():
    rng = np.random.default_rng(7)
    for trial in range(3):
        t_logits, t_boxes, targets, ragged = _rand_problem(rng, L=1)
        s_logits, s_boxes, _, _ = _rand_problem(rng, L=1)
        from simvg_tpu.losses.criterion import prepare_soft_targets

        tp, _ = prepare_soft_targets(
            jnp.asarray(t_logits[0]), jnp.asarray(t_boxes[0]), targets
        )
        ours = set_criterion(jnp.asarray(s_logits),
                             jnp.asarray(s_boxes), tp,
                             loss_class_type="weighted_ce_loss")
        oracle = oracle_soft_targets_and_weighted_loss(
            t_logits[0], t_boxes[0], s_logits, s_boxes, ragged
        )
        np.testing.assert_allclose(float(ours["total"]), oracle,
                                   rtol=3e-4, atol=3e-4)


def test_focal_loss_trains_no_object_column():
    """Reference focal builds a [B,Q,C+2] one-hot and drops only the
    never-set last column (criterion.py:141-148): unmatched queries get
    a POSITIVE label at the no-object column, so its logit receives
    gradient. Oracle in numpy."""
    import jax

    rng = np.random.default_rng(0)
    b, q, c = 2, 4, 1
    logits = jnp.asarray(rng.normal(size=(1, b, q, c + 1)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.5, (1, b, q, 4)), jnp.float32)
    tgts = Targets(
        labels=jnp.zeros((b, 1), jnp.int32),
        boxes=jnp.asarray(rng.uniform(0.2, 0.5, (b, 1, 4)), jnp.float32),
        valid=jnp.ones((b, 1), bool),
        weight=jnp.ones((b, 1), jnp.float32),
    )
    out = set_criterion(logits, boxes, tgts,
                        loss_class_type="focal_loss")
    assert np.isfinite(float(out["total"]))
    # gradient must reach the no-object column
    g = jax.grad(lambda lg: set_criterion(
        lg, boxes, tgts, loss_class_type="focal_loss")["total"])(logits)
    assert float(jnp.abs(g[..., -1]).sum()) > 0.0, (
        "no-object logit got no gradient")


def test_no_target_rows_excluded_from_gt_losses():
    """GRefCOCO no-target rows (label 1) must not be Hungarian targets
    for the GT losses (the reference drops category_id==-1 rows before
    any loss, tgqs_kd_detr_head.py:222-231)."""
    rng = np.random.default_rng(1)
    L, b, q = 1, 2, 3
    head_out = {
        "class_decoder": jnp.asarray(rng.normal(size=(L, b, q, 2)),
                                     jnp.float32),
        "bbox_decoder": jnp.asarray(rng.uniform(0.2, 0.6, (L, b, q, 4)),
                                    jnp.float32),
        "class_token": jnp.asarray(rng.normal(size=(L, b, q, 2)),
                                   jnp.float32),
        "bbox_token": jnp.asarray(rng.uniform(0.2, 0.6, (L, b, q, 4)),
                                  jnp.float32),
    }
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (b, 2, 4)), jnp.float32)
    # sample 0: one object row + one NO-TARGET row (label 1, valid)
    with_nt = Targets(
        labels=jnp.asarray([[0, 1], [0, 0]], jnp.int32),
        boxes=boxes,
        valid=jnp.asarray([[True, True], [True, True]]),
        weight=jnp.ones((b, 2), jnp.float32),
    )
    # same but the no-target row already invalid
    filtered = with_nt._replace(
        valid=jnp.asarray([[True, False], [True, True]]))
    kw = dict(branch_loss_weight={"decoder": 1.0})
    l1 = simvg_branch_losses(head_out, with_nt, **kw)
    l2 = simvg_branch_losses(head_out, filtered, **kw)
    np.testing.assert_allclose(float(l1["loss_total"]),
                               float(l2["loss_total"]), rtol=1e-6)


def test_score_weighted_wd_divides_by_full_bq():
    """weights_distill for score_weighted = mean over the FULL B*Q
    weight vectors with zeros below threshold
    (tgqs_kd_detr_head.py:240-247, 491)."""
    b, q = 2, 4
    logits = jnp.zeros((b, q, 2), jnp.float32)
    # softmax of zeros -> P(object)=0.5 everywhere
    boxes = jnp.full((b, q, 4), 0.4, jnp.float32)
    tgts = Targets(
        labels=jnp.zeros((b, 1), jnp.int32),
        boxes=jnp.full((b, 1, 4), 0.4, jnp.float32),
        valid=jnp.ones((b, 1), bool),
        weight=jnp.ones((b, 1), jnp.float32),
    )
    _, wd = prepare_soft_targets(logits, boxes, tgts,
                                 prepare_target_mode="score_weighted",
                                 predict_threshold=0.0)
    # all 8 queries above threshold with weight 0.5 -> mean 0.5
    np.testing.assert_allclose(float(wd), 0.5, rtol=1e-6)
    _, wd2 = prepare_soft_targets(logits, boxes, tgts,
                                  prepare_target_mode="score_weighted",
                                  predict_threshold=0.6)
    # nothing above threshold: mean over B*Q of zeros = 0
    np.testing.assert_allclose(float(wd2), 0.0, atol=1e-7)


def test_num_boxes_counts_untruncated_gt():
    """A 12-GT/10-query sample must normalise box losses by the FULL GT
    count (reference num_boxes sums len(t["labels"]) over the ragged,
    untruncated target lists, criterion.py:244-249) even though the
    matcher only pairs num_queries of them.  Hand-computed denominator:
    sum(|dx|*4)=10*0.04 -> loss_bbox = 5 * 0.4 / 12."""
    q, t_pad, full = 10, 10, 12
    # queries sit exactly on the 10 kept targets, offset by 0.01 in every
    # coordinate -> identity match, per-pair L1 = 0.04
    cx = np.linspace(0.1, 0.9, q, dtype=np.float32)
    tgt_boxes = np.stack(
        [cx, np.full(q, 0.5, np.float32), np.full(q, 0.05, np.float32),
         np.full(q, 0.05, np.float32)], -1)
    boxes = (tgt_boxes + 0.01)[None, None]  # [L=1, B=1, Q, 4]
    logits = np.zeros((1, 1, q, 2), np.float32)
    logits[..., 0] = 4.0  # confident object class
    targets = Targets(
        labels=jnp.zeros((1, t_pad), jnp.int32),
        boxes=jnp.asarray(tgt_boxes[None]),
        valid=jnp.ones((1, t_pad), bool),
        weight=jnp.ones((1, t_pad), jnp.float32),
    )
    base = set_criterion(jnp.asarray(logits), jnp.asarray(boxes), targets)
    fixed = set_criterion(jnp.asarray(logits), jnp.asarray(boxes),
                          targets,
                          gt_count=jnp.asarray([full], jnp.int32))
    # hand-computed reference value: 5 * (10 pairs * 4 coords * 0.01)/12
    np.testing.assert_allclose(float(fixed["loss_bbox"]),
                               5.0 * 10 * 4 * 0.01 / full, rtol=1e-5)
    # red/green: without gt_count the denominator is the truncated 10
    np.testing.assert_allclose(float(base["loss_bbox"]),
                               5.0 * 10 * 4 * 0.01 / t_pad, rtol=1e-5)
    # giou scales by the same ratio; the CE term ignores num_boxes
    np.testing.assert_allclose(float(fixed["loss_giou"]),
                               float(base["loss_giou"]) * t_pad / full,
                               rtol=1e-5)
    np.testing.assert_allclose(float(fixed["loss_class"]),
                               float(base["loss_class"]), rtol=1e-6)
    # plumbed through the branch orchestrator (decoder branch)
    head_out = {
        "class_decoder": jnp.asarray(logits),
        "bbox_decoder": jnp.asarray(boxes),
        "class_token": jnp.asarray(logits),
        "bbox_token": jnp.asarray(boxes),
    }
    bl = simvg_branch_losses(head_out, targets,
                             branch_loss_weight={"decoder": 1.0},
                             gt_count=jnp.asarray([full], jnp.int32))
    d = set_criterion(jnp.asarray(logits), jnp.asarray(boxes), targets,
                      gt_count=jnp.asarray([full], jnp.int32))
    np.testing.assert_allclose(float(bl["loss_dgt"]), float(d["total"]),
                               rtol=1e-6)


def test_collate_gt_count_untruncated():
    """collate() carries the untruncated object-GT count while the
    device arrays stay truncated to max_gt; GRec no-target rows
    (category_id == -1) are excluded (reference drops them before any
    loss, tgqs_kd_detr_head.py:222-231)."""
    from simvg_tpu.data.loader import collate

    def sample(n_boxes, categories=None):
        s = {
            "img": np.zeros((8, 8, 3), np.float32),
            "img_shape": (8, 8),
            "ref_expr_inds": np.zeros(4, np.int32),
            "text_attention_mask": np.zeros(4, np.int32),
            "gt_bbox": [np.asarray([0, 0, 4, 4], np.float32)] * n_boxes,
        }
        if categories is not None:
            s["target"] = [{"category_id": c} for c in categories]
        return s

    batch = collate(
        [sample(12, categories=[0] * 12),          # truncated to max_gt
         sample(1, categories=[-1]),               # GRec no-target
         sample(1)],                               # plain RefCOCO
        canvas=8, max_gt=10)
    np.testing.assert_array_equal(batch["gt_count"], [12, 0, 1])
    assert batch["gt_boxes"].shape == (3, 10, 4)
    assert batch["gt_valid"][0].sum() == 10
