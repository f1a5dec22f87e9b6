"""tools/data_process/convert_gref.py: mdetr COCO-format -> SimVG
instances.json, incl. the --trainset-only grouping variant (reference
tools/data_process/convert_gref.py and
convert_gref_only_format_trainset.py:50-83)."""

import json
import subprocess
import sys

import pytest

TOOL = "tools/data_process/convert_gref.py"


@pytest.fixture()
def gref_dir(tmp_path):
    """Two original images; image 1 has two expressions (two mdetr
    'image' records with the same original_id), one of them a
    no-target (category_id == -1) GRefCOCO record."""
    coco = {
        "images": [
            {"id": 10, "original_id": 1, "caption": "the left dog",
             "height": 40, "width": 60},
            {"id": 11, "original_id": 1, "caption": "nothing here",
             "height": 40, "width": 60},
            {"id": 12, "original_id": 2, "caption": "a red cup",
             "height": 30, "width": 30},
        ],
        "annotations": [
            {"id": 100, "image_id": 10, "category_id": 1,
             "bbox": [1, 2, 3, 4]},
            {"id": 101, "image_id": 11, "category_id": -1, "bbox": []},
            {"id": 102, "image_id": 12, "category_id": 1,
             "bbox": [5, 6, 7, 8]},
        ],
    }
    for split in ("train", "val"):
        (tmp_path / f"finetune_grefcoco_{split}.json").write_text(
            json.dumps(coco))
    return tmp_path


def _run(gref_dir, out, *flags):
    subprocess.run(
        [sys.executable, TOOL, str(gref_dir), str(out),
         "--splits", "train", "val", *flags],
        check=True, cwd="/root/repo", capture_output=True)
    return json.loads(out.read_text())


def test_grouped_default(gref_dir, tmp_path):
    out = _run(gref_dir, tmp_path / "inst.json")
    for split in ("train", "val"):
        recs = {r["image_id"]: r for r in out[split]}
        assert set(recs) == {1, 2}
        r1 = recs[1]
        assert r1["expressions"] == ["the left dog", "nothing here"]
        # per-expression ragged bbox lists; the no-target expression
        # carries an empty list
        assert r1["bbox"] == [[[1, 2, 3, 4]], [[]]]
        assert r1["annotations"][1][0]["category_id"] == -1
        assert recs[2]["height"] == 30


def test_trainset_only_keeps_eval_ungrouped(gref_dir, tmp_path):
    out = _run(gref_dir, tmp_path / "inst.json", "--trainset-only")
    # train grouped exactly like the default
    assert {r["image_id"] for r in out["train"]} == {1, 2}
    assert len(out["train"]) == 2
    # val: one record per (image, expression) pair, order preserved
    assert len(out["val"]) == 3
    assert [r["image_id"] for r in out["val"]] == [1, 1, 2]
    assert all(len(r["expressions"]) == 1 for r in out["val"])
    assert out["val"][1]["expressions"] == ["nothing here"]
