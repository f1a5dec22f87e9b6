import numpy as np
import pytest

from simvg_tpu.data import build_dataset, DataLoader
from simvg_tpu.data.tokenization import (
    SimpleTokenizer,
    build_word_vocab,
    build_tokenizer,
    clean_string,
)
from simvg_tpu.data.transforms import (
    Compose,
    LargeScaleJitter,
    Normalize,
    Pad,
    Resize,
)
from util_synth import make_grefcoco_style, make_refcoco_style


def test_clean_string():
    assert clean_string("The Man's red-hat, on/off!") == (
        "the mans red hat on off"
    )


def test_simple_tokenizer_framing():
    tok = SimpleTokenizer(vocab_size=1000)
    ids, mask = tok.encode("a green box", 8)
    assert ids.shape == (8,) and mask.shape == (8,)
    assert ids[0] == tok.bos_id
    assert ids[4] == tok.eos_id  # bos + 3 words + eos
    assert (ids[5:] == tok.pad_id).all()
    assert mask.tolist() == [0, 0, 0, 0, 0, 1, 1, 1]
    # truncation to max_token-2
    ids2, mask2 = tok.encode("one two three four five six seven", 5)
    assert ids2[0] == tok.bos_id and ids2[4] == tok.eos_id
    assert mask2.sum() == 0


def test_word_vocab_tokenizer():
    anns = {"train": [{"expressions": ["red dog", "blue cat"]}]}
    vocab = build_word_vocab(anns)
    tok = build_tokenizer("default", token2idx=vocab)
    ids, mask = tok.encode("red cat zebra", 4)
    assert ids[0] == vocab["red"]
    assert ids[1] == vocab["cat"]
    assert ids[2] == vocab["UNK"]
    assert mask.tolist() == [0, 0, 0, 1]


def _sample(img_hw=(100, 150), bbox=(10, 20, 60, 80)):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (*img_hw, 3), np.uint8)
    return {
        "img": img,
        "ori_shape": img.shape,
        "img_shape": img.shape,
        "pad_shape": img.shape,
        "with_bbox": True,
        "with_mask": False,
        "gt_bbox": np.asarray(bbox, np.float64),
        "scale_factor": np.ones(4, np.float32),
    }


def test_resize_exact():
    s = Resize((64, 32), keep_ratio=False)(_sample())
    assert s["img"].shape[:2] == (32, 64)
    # bbox scaled by (64/150, 32/100)
    np.testing.assert_allclose(
        s["gt_bbox"],
        [10 * 64 / 150, 20 * 32 / 100, 60 * 64 / 150, 80 * 32 / 100],
        rtol=1e-6,
    )


def test_normalize_bgr_to_rgb():
    s = _sample()
    img_bgr = s["img"].copy()
    out = Normalize(mean=[1.0, 2.0, 3.0], std=[2.0, 2.0, 2.0])(s)
    # channel 0 of output should be (R - 1)/2 = (bgr[...,2]-1)/2
    np.testing.assert_allclose(
        out["img"][..., 0], (img_bgr[..., 2].astype(np.float32) - 1) / 2
    )


def test_pad_divisor():
    s = Resize((50, 30), keep_ratio=False)(_sample())
    s = Pad(size_divisor=32)(s)
    assert s["img"].shape[:2] == (32, 64)
    assert s["img_shape"][:2] == (30, 50)  # valid extent preserved


def test_lsj_bbox_stays_in_bounds():
    import random

    for seed in range(5):
        s = _sample()
        t = LargeScaleJitter(out_max_size=64, rng=random.Random(seed))
        out = t(s)
        h, w = out["img"].shape[:2]
        b = out["gt_bbox"]
        assert 0 <= b[0] <= b[2] <= w
        assert 0 <= b[1] <= b[3] <= h
        assert max(h, w) <= int(64 * 1.4) + 2


def test_refcoco_dataset_and_loader(tmp_path):
    imgdir, annfile = make_refcoco_style(str(tmp_path))
    pipeline = [
        Resize((64, 64), keep_ratio=False),
        Normalize(mean=[123.675, 116.28, 103.53],
                  std=[58.395, 57.12, 57.375]),
        Pad(size_divisor=32),
    ]
    ds = build_dataset(
        "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile,
        which_set="train", max_token=10,
        use_token_type="beit3", transforms=pipeline,
    )
    assert len(ds) == 8
    s = ds[0]
    assert s["img"].shape == (64, 64, 3)
    assert s["ref_expr_inds"].shape == (10,)

    dl = DataLoader(ds, batch_size=4, canvas=64, max_gt=1, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (4, 64, 64, 3)
    assert b["gt_boxes"].shape == (4, 1, 4)
    assert b["gt_valid"].all()
    assert b["text_ids"].shape == (4, 10)
    assert len(b["meta"]) == 4
    # epoch reshuffle changes batch composition
    dl.set_epoch(1)
    b2 = next(iter(dl))
    assert (b2["text_ids"] != b["text_ids"]).any() or (
        [m["filename"] for m in b2["meta"]]
        != [m["filename"] for m in b["meta"]]
    )


def test_grefcoco_dataset(tmp_path):
    imgdir, annfile = make_grefcoco_style(str(tmp_path))
    pipeline = [
        Resize((64, 64), keep_ratio=False),
        Normalize(mean=[0, 0, 0], std=[1, 1, 1]),
        Pad(size_divisor=32),
    ]
    ds = build_dataset(
        "GRefCOCO", imgsfile=imgdir, annsfile=annfile, which_set="val",
        max_token=10, use_token_type="beit3", transforms=pipeline,
    )
    dl = DataLoader(ds, batch_size=6, canvas=64, max_gt=4, shuffle=False,
                    num_workers=2)
    b = next(iter(dl))
    # no-target sample: label 1, valid True (kept as a target with the
    # no-object class, tgqs_kd_detr_head.py:199-204)
    no_t = [i for i, m in enumerate(b["meta"])
            if m["target"][0]["category_id"] == -1]
    assert no_t, "synthetic set should contain a no-target sample"
    i = no_t[0]
    assert b["gt_labels"][i, 0] == 1
    assert b["gt_valid"][i, 0]
    multi = [i for i, m in enumerate(b["meta"]) if len(m["target"]) == 2]
    assert multi
    assert b["gt_valid"][multi[0]].sum() == 2


def test_eval_loader_pads_final_batch(tmp_path):
    imgdir, annfile = make_refcoco_style(str(tmp_path))
    ds = build_dataset(
        "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile, which_set="val",
        max_token=10, use_token_type="beit3",
        transforms=[Resize((64, 64), keep_ratio=False),
                    Normalize([0, 0, 0], [1, 1, 1]), Pad(size_divisor=32)],
    )
    dl = DataLoader(ds, batch_size=3, canvas=64, shuffle=False,
                    drop_last=False, num_workers=1)
    batches = list(dl)
    assert len(batches) == 2
    last = batches[-1]
    assert last["image"].shape[0] == 3  # static shape kept
    assert last["batch_valid"].tolist() == [True, False, False]


def test_dataset_determinism_across_thread_orders(tmp_path):
    """Expression sampling + augmentation must be a pure function of
    (seed, epoch, index): two loaders with different worker counts yield
    identical batches."""
    imgdir, annfile = make_refcoco_style(str(tmp_path))
    pipeline = lambda: [
        LargeScaleJitter(out_max_size=64),
        Resize((64, 64), keep_ratio=False),
        Normalize([0, 0, 0], [1, 1, 1]),
        Pad(size_divisor=32),
    ]
    from simvg_tpu.data import build_dataset, DataLoader

    def run(workers):
        ds = build_dataset(
            "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile,
            which_set="train", max_token=10, use_token_type="beit3",
            transforms=pipeline(), seed=7,
        )
        dl = DataLoader(ds, batch_size=4, canvas=64, num_workers=workers,
                        seed=7)
        dl.set_epoch(3)
        return next(iter(dl))

    b1, b2 = run(1), run(4)
    np.testing.assert_array_equal(b1["text_ids"], b2["text_ids"])
    np.testing.assert_allclose(b1["image"], b2["image"], atol=1e-6)
    np.testing.assert_allclose(b1["gt_boxes"], b2["gt_boxes"], atol=1e-6)
    # and a different epoch yields different augmentation
    ds = build_dataset(
        "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile,
        which_set="train", max_token=10, use_token_type="beit3",
        transforms=pipeline(), seed=7,
    )
    dl = DataLoader(ds, batch_size=4, canvas=64, num_workers=1, seed=7)
    dl.set_epoch(4)
    b3 = next(iter(dl))
    assert (np.asarray(b1["image"]) != np.asarray(b3["image"])).any()


def test_mixed_dataset_multi_source(tmp_path):
    """Mixed: per-source image roots + img_source filtering."""
    import json
    import os

    import cv2

    root = str(tmp_path)
    coco_dir = os.path.join(root, "coco")
    flickr_dir = os.path.join(root, "flickr")
    os.makedirs(coco_dir)
    os.makedirs(flickr_dir)
    img = np.zeros((40, 40, 3), np.uint8)
    cv2.imwrite(os.path.join(coco_dir,
                             "COCO_train2014_%012d.jpg" % 1), img)
    cv2.imwrite(os.path.join(flickr_dir, "2.jpg"), img)
    anns = {"train": [
        {"image_id": 1, "height": 40, "width": 40,
         "bbox": [1, 1, 10, 10], "expressions": ["a"],
         "data_source": "coco"},
        {"image_id": 2, "height": 40, "width": 40,
         "bbox": [1, 1, 10, 10], "expressions": ["b"],
         "data_source": "flickr"},
        {"image_id": 3, "height": 40, "width": 40,
         "bbox": [1, 1, 10, 10], "expressions": ["c"],
         "data_source": "visual-genome"},
    ]}
    annfile = os.path.join(root, "instances.json")
    json.dump(anns, open(annfile, "w"))
    ds = build_dataset(
        "Mixed",
        imgsfile={"coco": coco_dir, "flickr": flickr_dir},
        annsfile=annfile, which_set="train", max_token=8,
        img_source=["coco", "flickr"],  # filters out visual-genome
        use_token_type="beit3",
        transforms=[Resize((32, 32), keep_ratio=False),
                    Normalize([0, 0, 0], [1, 1, 1]),
                    Pad(size_divisor=32)],
    )
    assert len(ds) == 2  # visual-genome record filtered
    s0, s1 = ds[0], ds[1]
    assert s0["img"].shape == (32, 32, 3)
    assert "COCO_train2014" in s0["filename"]
    assert s1["filename"].endswith("2.jpg")


def test_filename_schemes(tmp_path):
    """Per-dataset image filename conventions (loading.py:82-95)."""
    from simvg_tpu.data.datasets import _filename_for

    assert _filename_for(
        "ReferItGameBerkeley", {"image_id": 7}, "/imgs"
    ) == "/imgs/7.jpg"
    assert _filename_for(
        "Flickr30k", {"image_id": 12345}, "/imgs"
    ) == "/imgs/12345.jpg"
    assert _filename_for(
        "RefCOCOPlusUNC", {"image_id": 9}, "/imgs"
    ) == "/imgs/COCO_train2014_000000000009.jpg"
    assert _filename_for(
        "GRefCOCO", {"image_id": 9}, "/imgs"
    ) == "/imgs/COCO_train2014_000000000009.jpg"
    assert _filename_for(
        "Mixed", {"image_id": 3, "data_source": "coco"},
        {"coco": "/c", "flickr": "/f"},
    ) == "/c/COCO_train2014_000000000003.jpg"
    assert _filename_for(
        "Mixed", {"image_id": 3, "data_source": "flickr"},
        {"coco": "/c", "flickr": "/f"},
    ) == "/f/3.jpg"


def test_lsj_giveup_never_exceeds_canvas():
    """LargeScaleJitter give-up branch (upscale + unsatisfiable crop IoU)
    must rescale back to <= out_max_size so Pad/collate can hold it."""
    import random

    from simvg_tpu.data.transforms import LargeScaleJitter

    lsj = LargeScaleJitter(out_max_size=64, jitter_min=1.35,
                           jitter_max=1.4, min_iou_thr=0.99,
                           jitter_times=3, rng=random.Random(0))
    img = np.zeros((100, 100, 3), np.uint8)
    s = dict(img=img, ori_shape=img.shape, with_bbox=True,
             gt_bbox=np.asarray([0.0, 0.0, 99.0, 99.0]))
    out = lsj(s)
    assert max(out["img"].shape[:2]) <= 64, out["img"].shape
    assert out["gt_bbox"].max() <= 64
    # scale_factor reflects the fitted resize (resized / original)
    np.testing.assert_allclose(out["scale_factor"], 0.64, rtol=1e-6)


def test_vocab_cache_roundtrip(tmp_path):
    """tokenize() writes/reads token_to_ix.pkl / ix_to_token.pkl /
    word_emb.npz next to the annotation file, with the reference's
    PAD=0/UNK=1/CLS=2 layout (datasets/utils.py:137-199)."""
    import json

    from simvg_tpu.data.tokenization import tokenize

    anns = {"train": [{"expressions": ["the red dog", "a dog"]}],
            "val": [{"expressions": ["red-ish thing!"]}]}
    annsfile = str(tmp_path / "instances.json")
    json.dump(anns, open(annsfile, "w"))

    t2i, i2t, emb = tokenize(annsfile, anns)
    assert (t2i["PAD"], t2i["UNK"], t2i["CLS"]) == (0, 1, 2)
    assert t2i["the"] == 3 and t2i["dog"] == 5  # first-seen order
    assert "red" in t2i and "ish" in t2i  # dash -> space, punct gone
    assert emb.shape == (len(t2i), 300)
    assert (tmp_path / "word_emb.npz").exists()

    # second call reads the cache (mutate the anns: result unchanged)
    anns2 = {"train": [{"expressions": ["completely different"]}]}
    t2i_b, _, emb_b = tokenize(annsfile, anns2)
    assert t2i_b == t2i
    np.testing.assert_allclose(emb_b, emb)


def test_corpus_tokenizer_mode(tmp_path):
    """'copus' mode framing: zero-padded word ids; the mask follows the
    framework-wide 1 = PAD convention (batch['text_padding_mask']
    consumers treat nonzero as padded). Reference mode is broken legacy
    — Corpus class absent — ours is a working equivalent
    (loading.py:184-209)."""
    import json

    from simvg_tpu.data.tokenization import build_tokenizer

    corpus = {"PAD": 0, "UNK": 1, "the": 2, "dog": 3}
    path = str(tmp_path / "corpus.json")
    json.dump(corpus, open(path, "w"))
    tok = build_tokenizer("copus", corpus_path=path)
    ids, mask = tok.encode("The dog barks", max_token=5)
    np.testing.assert_array_equal(ids, [2, 3, 1, 0, 0])
    np.testing.assert_array_equal(mask, [0, 0, 0, 1, 1])  # 1 = PAD
    assert tok.vocab_size == 4


def test_expr_sampling_global_rng_parity_mode(tmp_path):
    """Opt-in reference-sampling mode (VERDICT r2 #7): expression draw
    comes from the GLOBAL numpy stream exactly like the reference's
    np.random.choice (loading.py:108), is plumbed from the config dict,
    and differs from the default deterministic draw."""
    import numpy as np
    from util_synth import make_refcoco_style
    from simvg_tpu.data.builder import build_dataset_from_cfg

    root = str(tmp_path / "synth")
    make_refcoco_style(root, n_train=6, n_val=2)

    def cfg(extra):
        c = {
            "annsfile": f"{root}/instances.json",
            "imgsfile": f"{root}/images",
            "which_set": "train",
            "pipeline": [
                {"type": "LoadImageAnnotationsFromFile", "max_token": 8,
                 "with_bbox": True,
                 "use_token_type": "default", "dataset": "RefCOCOUNC"},
            ],
        }
        c.update(extra)
        return c

    ds_det = build_dataset_from_cfg(cfg({}), dataset_type="RefCOCOUNC")
    ds_ref = build_dataset_from_cfg(cfg({"expr_sampling": "global_rng"}),
                                    dataset_type="RefCOCOUNC")
    assert ds_det.expr_sampling == "deterministic"
    assert ds_ref.expr_sampling == "global_rng"

    # the global-RNG draw replays the reference stream exactly
    np.random.seed(6666)
    got = [ds_ref[i]["expression"] for i in range(len(ds_ref))]
    np.random.seed(6666)
    exprs = ds_ref.anns_all["train"]
    want = [a["expressions"][int(np.random.choice(len(a["expressions"])))]
            for a in exprs]
    assert got == want

    # and it actually consumes the stream: a different seed can change
    # the sequence, while the deterministic mode never does
    det1 = [ds_det[i]["expression"] for i in range(len(ds_det))]
    np.random.seed(1)
    det2 = [ds_det[i]["expression"] for i in range(len(ds_det))]
    assert det1 == det2
    seqs = set()
    for s in range(30):
        np.random.seed(s)
        seqs.add(tuple(ds_ref[i]["expression"]
                       for i in range(len(ds_ref))))
    assert len(seqs) > 1, "global_rng mode ignored the global stream"


def test_expression_rewrite_retokenizes(tmp_path):
    """A transform that rewrites the expression (VGTRAugment's flip
    swaps left<->right in the phrase) must get fresh token ids — the
    dataset tokenizes before the pipeline, so stale ids would keep
    saying the original side (round-3 review finding; the reference's
    VGTR dataset tokenizes AFTER augmentation, vgtr_aug.py:22-27)."""
    imgdir, annfile = make_refcoco_style(str(tmp_path))

    class RewriteExpr:
        def __call__(self, s):
            s["expression"] = "a completely different phrase"
            return s

    ds = build_dataset(
        "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile,
        which_set="train", max_token=10, use_token_type="beit3",
        transforms=[RewriteExpr()],
    )
    s = ds[0]
    want, _ = ds.tokenizer.encode("a completely different phrase", 10)
    np.testing.assert_array_equal(s["ref_expr_inds"], want)

    # no rewrite -> original ids untouched
    ds2 = build_dataset(
        "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile,
        which_set="train", max_token=10, use_token_type="beit3",
        transforms=[],
    )
    s2 = ds2[0]
    orig, _ = ds2.tokenizer.encode(s2["expression"], 10)
    np.testing.assert_array_equal(s2["ref_expr_inds"], orig)
