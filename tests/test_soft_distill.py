import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.losses.criterion import Targets, simvg_branch_losses
from simvg_tpu.losses.distill import soft_distill_losses


def test_soft_distill_zero_when_student_equals_confident_teacher():
    """If the student reproduces a very confident teacher exactly, the
    box terms vanish and the BCE approaches the teacher's entropy."""
    rng = np.random.default_rng(0)
    b, q = 2, 4
    obj = np.where(rng.normal(size=(b, q)) > 0, 10.0, -10.0)
    logits = jnp.asarray(
        np.stack([obj, -np.ones((b, q)) * 10.0], axis=-1), jnp.float32
    )
    boxes = jnp.asarray(rng.uniform(0.3, 0.6, (b, q, 4)), jnp.float32)
    out = soft_distill_losses(logits[None], boxes[None], logits, boxes)
    np.testing.assert_allclose(float(out["loss_bbox_distill"]), 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(float(out["loss_iou_distill"]), 0.0,
                               atol=1e-5)
    assert float(out["loss_cls_distill"]) < 0.05  # near-zero entropy


def test_soft_distill_gradients_flow_to_student_only():
    rng = np.random.default_rng(1)
    b, q = 2, 3
    t_logits = jnp.asarray(rng.normal(size=(b, q, 2)), jnp.float32)
    t_boxes = jnp.asarray(rng.uniform(0.2, 0.7, (b, q, 4)), jnp.float32)

    def loss(s_logits, s_boxes):
        return soft_distill_losses(s_logits[None], s_boxes[None],
                                   t_logits, t_boxes)["total"]

    g = jax.grad(loss, argnums=(0, 1))(
        jnp.zeros((b, q, 2)), jnp.full((b, q, 4), 0.5)
    )
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert float(jnp.abs(g[1]).sum()) > 0


def test_branch_losses_soft_distill_route():
    rng = np.random.default_rng(2)
    L, B, Q, T = 2, 2, 4, 2
    logits = jnp.asarray(rng.normal(size=(L, B, Q, 2)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (L, B, Q, 4)), jnp.float32)
    targets = Targets(
        labels=jnp.zeros((B, T), jnp.int32),
        boxes=jnp.asarray(rng.uniform(0.2, 0.6, (B, T, 4)), jnp.float32),
        valid=jnp.ones((B, T), bool),
        weight=jnp.ones((B, T), jnp.float32),
    )
    head_out = {
        "class_decoder": logits,
        "bbox_decoder": boxes,
        "class_token": logits[-1:],
        "bbox_token": boxes[-1:],
    }
    out = simvg_branch_losses(
        head_out, targets,
        branch_loss_weight={"decoder": 1.0, "token": 2.0, "distill": 1.0},
        distill_type="soft",
    )
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert "loss_kd" in out and "loss_tgt" in out
