import jax
import jax.numpy as jnp
import numpy as np

from simvg_tpu.models.heads.simple_head import DETRHead, DETRHeadConfig
from simvg_tpu.models.lan_encs import LSTMLanguageEncoder


def test_detr_head_shapes():
    cfg = DETRHeadConfig(num_queries=5, in_channels=32, embed_dim=32,
                         num_encoder_layers=1, num_decoder_layers=2,
                         attn_dropout=0.0, ffn_dropout=0.0)
    head = DETRHead(cfg)
    x = jnp.zeros((2, 4, 4, 32))
    mask = jnp.zeros((2, 4, 4), bool)
    params = head.init(jax.random.PRNGKey(0), x, mask)
    out = head.apply(params, x, mask)
    assert out["class_decoder"].shape == (2, 2, 5, 2)
    assert out["bbox_decoder"].shape == (2, 2, 5, 4)
    assert float(out["bbox_decoder"].min()) >= 0.0


def test_lstm_lan_enc_outputs_and_padding():
    enc = LSTMLanguageEncoder(vocab_size=50, word_emb_dim=16,
                              hidden_size=8, output_type="max")
    ids = jnp.asarray([[3, 7, 9, 0, 0], [2, 0, 0, 0, 0]], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids)
    y = enc.apply(params, ids)
    assert y.shape == (2, 1, 16)  # bidirectional -> 2*hidden

    # padding invariance: changing ids at padded positions is a no-op
    # on "max" pooling over valid positions ONLY if mask handling works
    ids2 = ids.at[0, 3].set(0).at[1, 4].set(0)
    y2 = enc.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)

    res = LSTMLanguageEncoder(
        vocab_size=50, word_emb_dim=16, hidden_size=8,
        output_type="original"
    )
    p2 = res.init(jax.random.PRNGKey(0), ids)
    out = res.apply(p2, ids)
    assert out["text_feat"].shape == (2, 5, 16)
    assert out["text_mask"].dtype == bool


def test_remat_encoder_grad():
    from simvg_tpu.models.beit3 import BEiT3Config, BEiT3Encoder

    cfg = BEiT3Config(img_size=32, patch_size=16, embed_dim=32,
                      num_heads=4, ffn_dim=64, num_layers=2,
                      vocab_size=50, drop_path_rate=0.0, remat=True)
    enc = BEiT3Encoder(cfg)
    img = jnp.ones((1, 32, 32, 3))
    ids = jnp.ones((1, 4), jnp.int32)
    mask = jnp.zeros((1, 4), jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), img, ids, mask)

    def loss(p):
        i, t, c = enc.apply(p, img, ids, mask)
        return (i ** 2).sum()

    g = jax.jit(jax.grad(loss))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))


def test_text_bucket_collate():
    from simvg_tpu.data.loader import collate

    def sample(n_real, t=20):
        ids = np.zeros(t, np.int32)
        mask = np.ones(t, np.int32)
        ids[:n_real] = 5
        mask[:n_real] = 0
        return {
            "img": np.zeros((8, 8, 3), np.float32),
            "img_shape": (8, 8, 3),
            "scale_factor": np.ones(4, np.float32),
            "ref_expr_inds": ids,
            "text_attention_mask": mask,
            "gt_bbox": np.asarray([0, 0, 4, 4], np.float64),
        }

    b = collate([sample(5), sample(7)], canvas=8,
                text_buckets=[8, 16, 20])
    assert b["text_ids"].shape == (2, 8)
    assert b["text_padding_mask"].shape == (2, 8)
    b2 = collate([sample(5), sample(18)], canvas=8,
                 text_buckets=[8, 16, 20])
    assert b2["text_ids"].shape == (2, 20)


def test_composed_one_stage_model():
    """SeqTR-style composition: ViT + GRU lan_enc + fusion + DETR head."""
    from simvg_tpu.models.fusion import (
        ComposedOneStageModel,
        CrossAttentionFusion,
    )
    from simvg_tpu.models.vis_encs import ViTConfig, ViTEncoder

    model = ComposedOneStageModel(
        vis_enc=ViTEncoder(ViTConfig(img_size=32, patch_size=16,
                                     embed_dim=32, num_heads=4,
                                     ffn_dim=64, num_layers=1)),
        lan_enc=LSTMLanguageEncoder(vocab_size=50, word_emb_dim=16,
                                    hidden_size=16,
                                    output_type="original"),
        fusion=CrossAttentionFusion(embed_dim=32, num_heads=4),
        head=DETRHead(DETRHeadConfig(num_queries=3, in_channels=32,
                                     embed_dim=32, num_encoder_layers=1,
                                     num_decoder_layers=1,
                                     attn_dropout=0.0, ffn_dropout=0.0)),
    )
    img = jnp.zeros((2, 32, 32, 3))
    ids = jnp.ones((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img, ids)
    out = model.apply(params, img, ids)
    assert out["class_decoder"].shape == (1, 2, 3, 2)
    assert out["bbox_decoder"].shape == (1, 2, 3, 4)


def test_resnet_backbone():
    from simvg_tpu.models.vis_encs import ResNetEncoder

    enc = ResNetEncoder(depths=(1, 1, 1, 1), widths=(32, 64, 128, 256))
    x = jnp.zeros((2, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 2, 2, 256)  # stride 32
    assert np.isfinite(np.asarray(out)).all()


def test_lstm_encoder_query_and_default_modes():
    import jax
    import jax.numpy as jnp

    from simvg_tpu.models.lan_encs import LSTMLanguageEncoder

    ids = jnp.asarray([[3, 4, 5, 0, 0], [6, 7, 0, 0, 0]], jnp.int32)

    q = LSTMLanguageEncoder(vocab_size=10, word_emb_dim=8,
                            hidden_size=16, output_type="query",
                            out_dim=12)
    params = q.init(jax.random.PRNGKey(0), ids)
    y = q.apply(params, ids)
    assert y.shape == (2, 4, 12)  # 4 parsers -> out_dim
    assert np.isfinite(np.asarray(y)).all()

    d = LSTMLanguageEncoder(vocab_size=10, word_emb_dim=8,
                            hidden_size=16, output_type="default")
    pd = d.init(jax.random.PRNGKey(0), ids)
    yd = d.apply(pd, ids)
    assert yd.shape == (2, 1, 32)  # final fwd+bwd hidden states

    # freeze_emb: embedding gradient must be zero
    def loss(p):
        return (d.apply(p, ids) ** 2).sum()

    g = jax.grad(loss)(pd)
    emb_g = g["params"]["embedding"]["embedding"]
    assert float(jnp.abs(emb_g).sum()) == 0.0
