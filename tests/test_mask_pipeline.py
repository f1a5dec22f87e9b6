"""with_mask data path: polygon GT -> bitmap -> transforms -> RLE."""

import numpy as np

from simvg_tpu.data.transforms import Normalize, Pad, Resize
from simvg_tpu.engine.metrics import mask_accuracy
from simvg_tpu.ops import rle as rle_ops


def _mask_sample(h=60, w=80):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    mask[10:40, 20:60] = 1
    return {
        "img": img,
        "ori_shape": img.shape,
        "img_shape": img.shape,
        "pad_shape": img.shape,
        "scale_factor": np.ones(4, np.float32),
        "with_bbox": False,
        "with_mask": True,
        "gt_mask": mask,
        "gt_mask_rle": rle_ops.encode(mask),
    }


def test_mask_through_resize_and_pad():
    s = _mask_sample()
    s = Resize((40, 30), keep_ratio=False)(s)
    assert s["gt_mask"].shape == (30, 40)
    s = Normalize([0, 0, 0], [1, 1, 1])(s)
    s = Pad(size_divisor=32)(s)
    assert s["gt_mask"].shape == (32, 64)
    # RLE stays in sync with the bitmap
    np.testing.assert_array_equal(rle_ops.decode(s["gt_mask_rle"]),
                                  s["gt_mask"])
    # mask area roughly preserved under resize ratio
    orig_frac = (30 * 40) / (60 * 80)
    assert abs(s["gt_mask"].sum() - 1200 * orig_frac) < 150


def test_mask_accuracy_metric():
    a = np.zeros((20, 20), np.uint8)
    a[:10] = 1
    b = np.zeros((20, 20), np.uint8)
    b[5:15] = 1
    ra, rb = rle_ops.encode(a), rle_ops.encode(b)
    m = mask_accuracy([ra], [rb])
    np.testing.assert_allclose(m["miou"], 100 / 3, rtol=1e-5)
    assert m["acc@0.5"] == 0.0
    m2 = mask_accuracy([ra], [ra])
    assert m2["acc@0.9"] == 100.0


def test_grefcoco_dataset_with_mask(tmp_path):
    """Dataset-level mask loading from polygon annotations."""
    import json
    import os

    import cv2

    from simvg_tpu.data import build_dataset

    imgdir = os.path.join(str(tmp_path), "images")
    os.makedirs(imgdir)
    img = np.zeros((50, 50, 3), np.uint8)
    cv2.imwrite(os.path.join(imgdir, "COCO_train2014_%012d.jpg" % 1), img)
    anns = {"val": [{
        "image_id": 1, "height": 50, "width": 50,
        "bbox": [10, 10, 20, 20],
        "expressions": ["thing"],
        "mask": [[10, 10, 30, 10, 30, 30, 10, 30]],
    }]}
    annfile = os.path.join(str(tmp_path), "instances.json")
    json.dump(anns, open(annfile, "w"))
    ds = build_dataset(
        "RefCOCOUNC", imgsfile=imgdir, annsfile=annfile, which_set="val",
        max_token=8, use_token_type="beit3", with_bbox=True,
        with_mask=True,
        transforms=[Resize((64, 64), keep_ratio=False),
                    Normalize([0, 0, 0], [1, 1, 1]), Pad(size_divisor=32)],
    )
    s = ds[0]
    assert s["gt_mask"].shape == (64, 64)
    assert s["is_crowd"] == 0
    assert s["gt_mask"].sum() > 0
    np.testing.assert_array_equal(rle_ops.decode(s["gt_mask_rle"]),
                                  s["gt_mask"])


def test_imshow_expr_mask(tmp_path):
    import os

    from simvg_tpu.utils.visualize import imshow_expr_mask

    img = np.zeros((40, 40, 3), np.uint8)
    m1 = np.zeros((40, 40), np.uint8)
    m1[5:20, 5:20] = 1
    m2 = np.zeros((40, 40), np.uint8)
    m2[15:30, 15:30] = 1
    out = os.path.join(str(tmp_path), "m.jpg")
    vis = imshow_expr_mask(img, rle_ops.encode(m1), out,
                           gt_mask_rle=rle_ops.encode(m2))
    assert os.path.exists(out)
    assert vis[10, 10].sum() > 0  # pred overlay drawn
    assert vis[25, 25].sum() > 0  # gt overlay drawn


def test_load_word_embeddings(tmp_path):
    import os

    from simvg_tpu.data.tokenization import load_word_embeddings

    vocab = {"PAD": 0, "cat": 1, "dog": 2, "UNK": 3}
    # fallback path
    emb = load_word_embeddings(None, vocab, dim=16)
    assert emb.shape == (4, 16)
    # cached npz path
    p = os.path.join(str(tmp_path), "word_emb.npz")
    np.savez(p, emb=np.ones((4, 8), np.float32))
    emb2 = load_word_embeddings(p, vocab)
    assert emb2.shape == (4, 8) and (emb2 == 1).all()


def test_sample_mask_vertices_modes():
    import cv2

    from simvg_tpu.data.transforms import SampleMaskVertices

    mask = np.zeros((64, 64), np.uint8)
    cv2.circle(mask, (32, 32), 20, 1, -1)

    s = dict(with_mask=True, gt_mask=mask, pad_shape=(64, 64, 3))
    out = SampleMaskVertices(num_ray=18)(dict(s))
    v = out["gt_mask_vertices"]
    assert v.shape == (2, 18)
    got = v[:, v[0] >= 0]
    # strided contour points: all on the circle boundary (radius ~20)
    r = np.sqrt((got[0] - 32) ** 2 + (got[1] - 32) ** 2)
    assert (np.abs(r - 20) < 2.5).all(), r
    np.testing.assert_allclose(out["mass_center"], [32, 32], atol=1.0)

    out_c = SampleMaskVertices(num_ray=18, center_sampling=True)(dict(s))
    vc = out_c["gt_mask_vertices"]
    gc = vc[:, vc[0] >= 0]
    rc = np.sqrt((gc[0] - 32) ** 2 + (gc[1] - 32) ** 2)
    assert (np.abs(rc - 20) < 2.5).all(), rc
    # ray sampling covers all 18 evenly spaced angles on a circle
    assert gc.shape[1] == 18

    # degenerate: empty mask -> KEEP=False -> all -1 center
    empty = dict(with_mask=True, gt_mask=np.zeros((8, 8), np.uint8),
                 pad_shape=(8, 8, 3))
    out_e = SampleMaskVertices(num_ray=6)(empty)
    assert (out_e["gt_mask_vertices"] == -1).all()
    np.testing.assert_allclose(out_e["mass_center"], [-1, -1])
