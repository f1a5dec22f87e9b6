import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.engine import create_optimizer


def test_freeze_layer_masks_encoder_updates():
    params = {
        "params": {
            "beit3": {
                "layers_0": {"w": jnp.ones((4, 4))},
                "layers_1": {"w": jnp.ones((4, 4))},
                "text_embed": {"embedding": jnp.ones((10, 4))},
            },
            "head": {"k": jnp.ones((4,))},
        }
    }
    tx = create_optimizer(1e-2, steps_per_epoch=10, freeze_layer=1,
                          grad_norm_clip=0.0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    u = updates["params"]
    assert float(jnp.abs(u["beit3"]["layers_0"]["w"]).sum()) == 0.0
    assert float(jnp.abs(u["beit3"]["layers_1"]["w"]).sum()) > 0.0
    assert float(jnp.abs(u["beit3"]["text_embed"]["embedding"]).sum()) > 0
    assert float(jnp.abs(u["head"]["k"]).sum()) > 0.0


def test_freeze_layer_scan_layout_masks_stacked_rows():
    """scan_layers=True stacks all encoder layers in ONE leaf under
    'layers' [L, ...]; freeze_layer must zero the frozen ROWS (round-1
    VERDICT weak #4: it silently no-oped)."""
    L = 3
    params = {
        "params": {
            "beit3": {
                "layers": {"ffn": {"kernel": jnp.ones((L, 4, 4))}},
                "text_embed": {"embedding": jnp.ones((10, 4))},
            },
            "head": {"k": jnp.ones((4,))},
        }
    }
    tx = create_optimizer(1e-2, steps_per_epoch=10, freeze_layer=2,
                          grad_norm_clip=0.0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    k = updates["params"]["beit3"]["layers"]["ffn"]["kernel"]
    assert float(jnp.abs(k[0]).sum()) == 0.0
    assert float(jnp.abs(k[1]).sum()) == 0.0
    assert float(jnp.abs(k[2]).sum()) > 0.0
    assert float(jnp.abs(
        updates["params"]["head"]["k"]).sum()) > 0.0


def test_freeze_layer_scan_layout_end_to_end():
    """Full model, scan layout: frozen layer rows stay bit-identical
    through real optimizer steps; unfrozen rows and the head move."""
    from simvg_tpu.engine import create_train_state, make_train_step
    from simvg_tpu.models import SimVGModel, SimVGConfig
    from simvg_tpu.models.beit3 import BEiT3Config
    from simvg_tpu.models.heads.tgqs_head import TGQSHeadConfig

    model = SimVGModel(SimVGConfig(
        beit3=BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                          num_heads=4, ffn_dim=64, num_layers=2,
                          vocab_size=64, drop_path_rate=0.0,
                          scan_layers=True),
        head=TGQSHeadConfig(num_queries=1, in_channels=32, embed_dim=32,
                            num_decoder_layers=1, num_tgqg_layers=1,
                            attn_dropout=0.0, ffn_dropout=0.0),
    ))
    r = np.random.default_rng(0)
    xy = r.uniform(2, 12, (2, 1, 2))
    wh = r.uniform(4, 12, (2, 1, 2))
    batch = dict(
        image=jnp.asarray(r.normal(size=(2, 32, 32, 3)), jnp.float32),
        text_ids=jnp.asarray(r.integers(1, 64, (2, 6)), jnp.int32),
        text_padding_mask=jnp.zeros((2, 6), jnp.int32),
        img_shape=jnp.full((2, 2), 32, jnp.int32),
        gt_boxes=jnp.asarray(np.concatenate([xy, xy + wh], -1),
                             jnp.float32),
        gt_labels=jnp.zeros((2, 1), jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        **{k: batch[k] for k in
           ("image", "text_ids", "text_padding_mask", "img_shape")})
    tx = create_optimizer(1e-2, steps_per_epoch=10, freeze_layer=1,
                          grad_norm_clip=0.15)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(
        model, tx,
        branch_loss_weight={"decoder": 1.0,
                            "balanced_distill": {"token": 2.0,
                                                 "distill": 1.0}},
        ema_alpha=None))
    before = jax.tree.map(np.asarray, params)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    after = jax.tree.map(np.asarray, state.params)

    b_l = before["params"]["beit3"]["layers"]
    a_l = after["params"]["beit3"]["layers"]
    flat_b = jax.tree_util.tree_flatten(b_l)[0]
    flat_a = jax.tree_util.tree_flatten(a_l)[0]
    moved_unfrozen = False
    for vb, va in zip(flat_b, flat_a):
        np.testing.assert_array_equal(vb[0], va[0])  # frozen layer 0
        if not np.array_equal(vb[1], va[1]):
            moved_unfrozen = True
    assert moved_unfrozen
    head_b = jax.tree_util.tree_flatten(before["params"]["head"])[0]
    head_a = jax.tree_util.tree_flatten(after["params"]["head"])[0]
    assert any(not np.array_equal(b, a) for b, a in zip(head_b, head_a))
