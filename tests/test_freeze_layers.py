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
