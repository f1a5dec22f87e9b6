"""HF-roberta -> BERTLanguageEncoder conversion parity.

Oracle: a real ``transformers.RobertaModel`` (torch, random-init tiny
config) — the exact class the reference's ALBERTA lan_enc wraps
(simvg/models/lan_encs/bert.py:35).  Converted flax outputs must match
the torch hidden states at fp32 tolerance on the non-pad positions.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from simvg_tpu.models.lan_encs import BERTLanguageEncoder

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_checkpoint import convert_hf_bert  # noqa: E402


def _tiny_roberta():
    cfg = transformers.RobertaConfig(
        vocab_size=60, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=24, pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    return transformers.RobertaModel(cfg, add_pooling_layer=False).eval()


def test_hf_roberta_conversion_matches_torch():
    tm = _tiny_roberta()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    enc = BERTLanguageEncoder(
        vocab_size=60, hidden_size=32, num_layers=2, num_heads=4,
        max_positions=24, position_offset=2,  # roberta pad_idx+1
    )
    rng = np.random.default_rng(0)
    b, t, real = 3, 8, 6
    ids = rng.integers(2, 60, (b, t)).astype(np.int32)
    ids[:, real:] = 1  # roberta pad id
    pad_mask = (ids == 1).astype(np.int32)

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(pad_mask))
    params = jax.tree.map(np.asarray, params)
    report = convert_hf_bert(sd, params, out_prefix="")
    assert len(report) >= 4 + 2 * 16  # embeddings + 2 layers x 8 tensors

    ours = enc.apply(params, jnp.asarray(ids), jnp.asarray(pad_mask))
    with torch.no_grad():
        theirs = tm(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(1 - pad_mask),
        ).last_hidden_state.numpy()

    # pad rows differ by construction (HF pins pad position ids to the
    # padding index; they are masked out of attention either way)
    np.testing.assert_allclose(
        np.asarray(ours["text_feat"])[:, :real],
        theirs[:, :real], rtol=2e-5, atol=2e-5,
    )


def test_hf_bert_dispatch_and_prefix(tmp_path):
    """load_pretrained_into_params auto-dispatches an HF checkpoint to
    the lan_enc subtree, including 'roberta.'-prefixed state dicts."""
    from convert_checkpoint import load_pretrained_into_params

    tm = _tiny_roberta()
    sd = {"roberta." + k: v for k, v in tm.state_dict().items()}
    path = str(tmp_path / "tiny_roberta.pth")
    torch.save(sd, path)

    enc = BERTLanguageEncoder(vocab_size=60, hidden_size=32,
                              num_layers=2, num_heads=4,
                              max_positions=24, position_offset=2)
    ids = jnp.ones((1, 4), jnp.int32)
    inner = enc.init(jax.random.PRNGKey(0), ids)
    params = {"params": {"lan_enc": inner["params"]}}
    before = np.asarray(
        params["params"]["lan_enc"]["word_embeddings"]["embedding"]).copy()
    params = load_pretrained_into_params(params, path)
    after = np.asarray(
        params["params"]["lan_enc"]["word_embeddings"]["embedding"])
    assert not np.allclose(before, after)
    np.testing.assert_allclose(
        after, tm.state_dict()["embeddings.word_embeddings.weight"].numpy(),
        rtol=1e-6)


def test_hf_bert_layer_count_mismatch_raises():
    tm = _tiny_roberta()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    enc = BERTLanguageEncoder(vocab_size=60, hidden_size=32,
                              num_layers=3, num_heads=4, max_positions=24)
    params = jax.tree.map(
        np.asarray,
        enc.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32)))
    with pytest.raises((ValueError, KeyError)):
        convert_hf_bert(sd, params, out_prefix="")
