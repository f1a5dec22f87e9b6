"""GRefCOCO protocol tests: metric hand-computed cases + the padded
multi-target/no-target training path."""

import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.engine.metrics import grec_f1_nacc
from simvg_tpu.losses.criterion import Targets, simvg_branch_losses

BLW = {"decoder": 1.0, "balanced_distill": {"token": 2.0, "distill": 1.0}}


def test_grec_f1_hand_cases():
    box = lambda x, y, w, h: np.asarray([x, y, x + w, y + h], np.float64)

    # case 1: single GT, confident matching pred -> correct image, TN
    # case 2: no-target, no confident pred -> correct, TP
    # case 3: no-target, confident pred -> wrong, FN
    # case 4: two GT, one matching pred -> F1=2/3 -> wrong, TN
    preds = [
        np.stack([box(10, 10, 20, 20), box(50, 50, 5, 5)]),
        np.stack([box(0, 0, 10, 10)]),
        np.stack([box(0, 0, 10, 10)]),
        np.stack([box(10, 10, 20, 20)]),
    ]
    scores = [
        np.asarray([0.9, 0.1]),
        np.asarray([0.2]),
        np.asarray([0.95]),
        np.asarray([0.9]),
    ]
    gts = [
        box(10, 10, 20, 20)[None],
        box(0, 0, 0, 0)[None],
        box(0, 0, 0, 0)[None],
        np.stack([box(10, 10, 20, 20), box(60, 60, 20, 20)]),
    ]
    targets = [
        [{"category_id": 1}],
        [{"category_id": -1}],
        [{"category_id": -1}],
        [{"category_id": 1}, {"category_id": 1}],
    ]
    m = grec_f1_nacc(preds, scores, gts, targets)
    # correct images: case1 (F1=1) + case2 (no-target, no pred) = 2/4
    np.testing.assert_allclose(m["F1_score"], 50.0)
    # N-acc: TP=1 (case2), FN=1 (case3) -> 50%
    np.testing.assert_allclose(m["N_acc"], 50.0)
    assert m["TN"] == 2 and m["FP"] == 0


def test_grec_score_filter_and_greedy_matching():
    box = lambda x, y, w, h: np.asarray([x, y, x + w, y + h], np.float64)
    # two GT, two confident preds both matching distinct GT -> F1=1
    preds = [np.stack([box(0, 0, 10, 10), box(50, 50, 10, 10)])]
    scores = [np.asarray([0.8, 0.75])]
    gts = [np.stack([box(0, 0, 10, 10), box(50, 50, 10, 10)])]
    targets = [[{"category_id": 1}, {"category_id": 1}]]
    m = grec_f1_nacc(preds, scores, gts, targets)
    np.testing.assert_allclose(m["F1_score"], 100.0)
    # same but one pred below threshold -> only 1 matched, F1=2/3 -> 0
    scores = [np.asarray([0.8, 0.5])]
    m = grec_f1_nacc(preds, scores, gts, targets)
    np.testing.assert_allclose(m["F1_score"], 0.0)


def test_grec_training_losses_with_no_target_rows():
    """Padded grec batch: labels==1 rows (no-target) join the CE loss but
    are excluded from distill targets (tgqs_kd_detr_head.py:222-229)."""
    rng = np.random.default_rng(0)
    L, B, Q, T = 2, 3, 10, 4
    logits = jnp.asarray(rng.normal(size=(L, B, Q, 2)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (L, B, Q, 4)), jnp.float32)
    labels = np.zeros((B, T), np.int32)
    valid = np.zeros((B, T), bool)
    valid[0, :2] = True           # 2 objects
    valid[1, 0] = True
    labels[1, 0] = 1              # no-target sample
    valid[2, :3] = True
    head_out = {
        "class_decoder": logits,
        "bbox_decoder": boxes,
        "class_token": logits[-1:],
        "bbox_token": boxes[-1:],
    }
    targets = Targets(
        labels=jnp.asarray(labels),
        boxes=jnp.asarray(rng.uniform(0.2, 0.6, (B, T, 4)), jnp.float32),
        valid=jnp.asarray(valid),
        weight=jnp.ones((B, T), jnp.float32),
    )
    out = jax.jit(
        lambda h, t: simvg_branch_losses(h, t, branch_loss_weight=BLW)
    )(head_out, targets)
    for k, v in out.items():
        assert np.isfinite(float(v)), (k, float(v))
    # distill weight only averages over object rows (5 of 6 valid)
    assert 0.0 <= float(out["loss_distill_w"]) <= 1.0


def test_merge_branch_and_shared_head():
    """merge branch loss runs (2*T <= Q) and share_predicthead ties the
    two branches' prediction heads."""
    rng = np.random.default_rng(5)
    L, B, Q, T = 2, 2, 8, 3
    logits = jnp.asarray(rng.normal(size=(L, B, Q, 2)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (L, B, Q, 4)), jnp.float32)
    targets = Targets(
        labels=jnp.zeros((B, T), jnp.int32),
        boxes=jnp.asarray(rng.uniform(0.2, 0.6, (B, T, 4)), jnp.float32),
        valid=jnp.ones((B, T), bool),
        weight=jnp.ones((B, T), jnp.float32),
    )
    head_out = {
        "class_decoder": logits, "bbox_decoder": boxes,
        "class_token": logits[-1:], "bbox_token": boxes[-1:],
    }
    out = simvg_branch_losses(
        head_out, targets,
        branch_loss_weight={"decoder": 1.0, "token": 1.0, "merge": 0.5},
    )
    assert "loss_merge" in out and np.isfinite(float(out["loss_merge"]))

    # shared prediction head: params contain no token-specific heads
    from simvg_tpu.models.heads.tgqs_head import (
        TGQSHeadConfig,
        TGQSKDDETRHead,
    )

    cfg = TGQSHeadConfig(num_queries=2, in_channels=16, embed_dim=16,
                         num_decoder_layers=1, num_tgqg_layers=1,
                         share_predicthead=True, attn_dropout=0.0,
                         ffn_dropout=0.0)
    head = TGQSKDDETRHead(cfg)
    params = head.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 2, 16)), jnp.zeros((1, 2, 2), bool),
        jnp.zeros((1, 16)), jnp.zeros((1, 4, 16)),
        jnp.zeros((1, 4), jnp.int32),
    )
    keys = params["params"].keys()
    assert "class_embed_decoder" in keys
    assert "class_embed_token" not in keys
    assert "bbox_embed_token" not in keys


def test_grec_full_gt_denominator_beyond_num_queries():
    """12 GT with 10 queries: all 10 predictions match, but F1 =
    2*10/(2*10+0+2) = 20/22 < 1.0, so the image is NOT correct.
    Truncating GT to num_queries (round-1 bug) inflated this to F1=1."""
    from simvg_tpu.engine.metrics import grec_f1_nacc

    gts = np.asarray(
        [[10 * i, 0, 10 * i + 8, 8] for i in range(12)], np.float64)
    preds = gts[:10].copy()  # 10 perfect predictions
    scores = np.full(10, 0.9)
    target = [{"category_id": 1}] * 12
    m = grec_f1_nacc([preds], [scores], [gts], [target])
    assert m["F1_score"] == 0.0, m
    # and with exactly 10 GT the same predictions ARE correct
    m2 = grec_f1_nacc([preds], [scores], [gts[:10]], [target[:10]])
    assert m2["F1_score"] == 100.0, m2


def test_grec_equal_score_tiebreak_matches_reference_formula():
    """Reference sorts (score, box) tuples lexicographically descending
    (apis/test.py:105). With equal scores the box with larger
    coordinates sorts FIRST; hand-compute the reference outcome on a
    degenerate equal-GIoU case and assert parity."""
    from simvg_tpu.engine.metrics import grec_f1_nacc

    # two equal-score predictions; only one GT. Greedy matching zeroes
    # the matched row/col; outcome (TP=1, FP=1, FN=0 -> F1=2/3 < 1)
    boxes = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float64)
    scores = np.asarray([0.8, 0.8])
    gts = np.asarray([[0, 0, 10, 10]], np.float64)
    target = [{"category_id": 1}]
    m = grec_f1_nacc([boxes], [scores], [gts], [target])
    # hand: sorted desc -> [[20,20,30,30], [0,0,10,10]]; both >= 0.7
    # kept; best giou pair is ([0,0,10,10], gt)=1.0 -> TP=1; FP=1;
    # F1=2/3 -> not correct
    assert m["F1_score"] == 0.0 and m["TN"] == 1.0, m

    # threshold edge with a tie exactly at 0.7: both kept (>=)
    scores2 = np.asarray([0.7, 0.7])
    m2 = grec_f1_nacc([boxes], [scores2], [gts], [target])
    assert m2["F1_score"] == 0.0, m2

    # single prediction, no-target image: FN bookkeeping
    m3 = grec_f1_nacc([boxes[:1]], [np.asarray([0.9])],
                      [np.zeros((1, 4))], [[{"category_id": -1}]])
    assert m3["FN"] == 1.0 and m3["N_acc"] == 0.0


def test_collate_meta_carries_full_gt_list():
    from simvg_tpu.data.loader import collate

    boxes = [np.asarray([float(i), 0.0, float(i) + 5, 5.0])
             for i in range(12)]
    s = {
        "img": np.zeros((16, 16, 3), np.float32),
        "img_shape": (16, 16, 3),
        "ref_expr_inds": np.zeros(4, np.int64),
        "text_attention_mask": np.ones(4, np.int64),
        "gt_bbox": boxes,
        "target": [{"category_id": 1}] * 12,
    }
    out = collate([s], canvas=16, max_gt=10)
    assert out["gt_boxes"].shape == (1, 10, 4)  # device arrays truncated
    full = out["meta"][0]["gt_bbox_all"]
    assert full.shape == (12, 4)  # meta keeps everything
    np.testing.assert_allclose(full[11], boxes[11])
