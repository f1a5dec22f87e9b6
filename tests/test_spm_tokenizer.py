"""Golden-vector tests for the beit3 tokenizer path.

Pins the exact reference framing
(_load_expression_tokenize_beit3, loading.py:157-182):
clean -> sentencepiece unigram ids (XLM-R convention) -> truncate to
max_token-2 -> [BOS] + ids + [EOS] -> pad with <pad>=1 to max_token;
padding_mask 1 = pad. Uses a hand-built REAL .spm ModelProto fixture
(parse/serialize are wire-format protobuf), so the same code path loads
the released beit3.spm when assets mount.
"""

import numpy as np
import pytest

from simvg_tpu.data.spm import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceUnigram,
    parse_model_proto,
    serialize_model_proto,
)
from simvg_tpu.data.tokenization import (
    XLMRSentencePieceTokenizer,
    build_tokenizer,
)

S = "▁"  # sentencepiece space marker

PIECES = [
    ("<unk>", 0.0, UNKNOWN),      # spm id 0
    ("<s>", 0.0, CONTROL),        # spm id 1
    ("</s>", 0.0, CONTROL),       # spm id 2
    (S + "the", -1.0, NORMAL),    # 3
    (S + "dog", -2.0, NORMAL),    # 4
    (S + "do", -3.0, NORMAL),     # 5
    ("g", -0.5, NORMAL),          # 6
    (S, -4.0, NORMAL),            # 7
    ("d", -1.0, NORMAL),          # 8
    ("o", -1.0, NORMAL),          # 9
    (S + "th", -5.0, NORMAL),     # 10
    ("e", -1.0, NORMAL),          # 11
]


@pytest.fixture()
def spm_file(tmp_path):
    p = tmp_path / "tiny.spm"
    p.write_bytes(serialize_model_proto(PIECES))
    return str(p)


def test_model_proto_roundtrip(spm_file):
    parsed = parse_model_proto(open(spm_file, "rb").read())
    assert [(p, t) for p, _, t in parsed] == [(p, t) for p, _, t in PIECES]
    np.testing.assert_allclose([s for _, s, _ in parsed],
                               [s for _, s, _ in PIECES], rtol=1e-6)


def test_viterbi_golden_segmentations(spm_file):
    sp = SentencePieceUnigram.from_file(spm_file)
    # "the dog" -> "_the" (-1) + "_dog" (-2) = -3 beats
    # "_the"+"_do"+"g" (-4.5) and char paths
    assert sp.encode_pieces("the dog") == [S + "the", S + "dog"]
    assert sp.encode_ids("the dog") == [3, 4]
    # unknown char 'x': min_score(-5) - 10 penalty forces single-unk
    assert sp.encode_ids("dox") == [5, 0]  # "_do" + <unk>
    # competition: "_dog" (-2) beats "_do"+"g" (-3.5)
    assert sp.encode_ids("dog") == [4]
    # whitespace collapse: double space == single space
    assert sp.encode_ids("the  dog") == sp.encode_ids("the dog")
    # a maximal run of unknown characters collapses into ONE <unk>
    # (sentencepiece merges consecutive unknown pieces)
    assert sp.encode_ids("doxxx") == [5, 0]  # "_do" + <unk>
    assert sp.encode_ids("doxxg") == [5, 0, 6]  # unk run then "g"


def test_xlmr_id_convention_and_framing(spm_file):
    tok = XLMRSentencePieceTokenizer(spm_file)
    # fairseq offset +1 over spm ids
    assert tok.tokenize_to_ids("the dog") == [4, 5]
    assert tok.tokenize_to_ids("dox") == [6, 3]  # unk -> 3
    # vocab: sp pieces + offset + <mask>
    assert tok.vocab_size == len(PIECES) + 2

    # GOLDEN framing vectors (red if truncate->BOS/EOS->pad drifts):
    ids, mask = tok.encode("the dog", max_token=6)
    np.testing.assert_array_equal(ids, [0, 4, 5, 2, 1, 1])
    np.testing.assert_array_equal(mask, [0, 0, 0, 0, 1, 1])

    # truncation to max_token-2 BEFORE adding BOS/EOS
    ids, mask = tok.encode("the dog the dog the dog", max_token=4)
    np.testing.assert_array_equal(ids, [0, 4, 5, 2])
    np.testing.assert_array_equal(mask, [0, 0, 0, 0])

    # cleaning: punctuation stripped, case folded (loading.py:14-19)
    ids2, _ = tok.encode("The, Dog!", max_token=6)
    ids3, _ = tok.encode("the dog", max_token=6)
    np.testing.assert_array_equal(ids2, ids3)


def test_build_tokenizer_uses_spm_when_present(spm_file):
    tok = build_tokenizer("beit3", spm_path=spm_file)
    assert isinstance(tok, XLMRSentencePieceTokenizer)
    # missing file falls back to the hashing tokenizer
    fb = build_tokenizer("beit3", spm_path="/nonexistent/beit3.spm")
    assert type(fb).__name__ == "SimpleTokenizer"


def test_against_real_sentencepiece_if_available(spm_file):
    """Cross-check our Viterbi against the C++ sentencepiece library
    when it exists (it does not in this image; runs on dev machines)."""
    sp_lib = pytest.importorskip("sentencepiece")
    proc = sp_lib.SentencePieceProcessor()
    proc.LoadFromSerializedProto(open(spm_file, "rb").read())
    ours = SentencePieceUnigram.from_file(spm_file)
    for text in ("the dog", "dog", "dox", "the the dog"):
        norm = ours._normalize(text)
        assert proc.EncodeAsPieces(text) == ours.encode_pieces(text), (
            text, norm)
