"""Smoke tests for the qualitative/profiling misc CLIs (reference
tools/misc/*: browse_dataset, dataset_token_count, parameters,
inference_time, attn_visual, vis_cam, heatmap — SURVEY.md §2.1) and the
parity probe.  These tools previously had zero automated coverage; each
test runs the real CLI in a subprocess on synthetic data / random init
and asserts its contract (files written, stats printed, diffs small).
"""

import json
import os
import re
import subprocess
import sys

import pytest

from util_synth import make_refcoco_style

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = "configs/smoke/tiny_synth.py"


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_refcoco_style(str(root), n_train=6, n_val=4)
    return root


def _run(cmd, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)
    assert proc.returncode == 0, (proc.stdout[-1500:],
                                  proc.stderr[-1500:])
    return proc


def _data_opts(root):
    return [
        f"data.train.annsfile={root}/instances.json",
        f"data.train.imgsfile={root}/images",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]


def test_parameters_tool():
    proc = _run([sys.executable, "tools/misc/parameters.py", CFG,
                 "--platform", "cpu"])
    # per-submodule + total counts (reference counts decoder params)
    assert re.search(r"\d", proc.stdout), proc.stdout


def test_dataset_token_count(synth):
    proc = _run([sys.executable, "tools/misc/dataset_token_count.py",
                 f"{synth}/instances.json", "--split", "train",
                 "--tokenizer", "beit3"])
    assert re.search(r"\d", proc.stdout), proc.stdout


def test_browse_dataset(synth, tmp_path):
    out = tmp_path / "browse"
    _run([sys.executable, "tools/misc/browse_dataset.py", CFG,
          "--which-set", "train", "--output-dir", str(out),
          "--num", "2", "--platform", "cpu",
          "--cfg-options", *_data_opts(synth)])
    files = os.listdir(out)
    assert len(files) >= 2, files
    assert all(os.path.getsize(out / f) > 0 for f in files)


def test_inference_time(synth):
    proc = _run([sys.executable, "tools/misc/inference_time.py", CFG,
                 "--batch-size", "2", "--iters", "3", "--warmup", "1",
                 "--platform", "cpu"])
    # latency percentiles + FLOPs analysis in the output
    assert re.search(r"p50|median", proc.stdout, re.I), proc.stdout


@pytest.mark.parametrize("tool", ["attn_visual", "vis_cam"])
def test_visualization_tools(synth, tmp_path, tool):
    out = tmp_path / tool
    _run([sys.executable, f"tools/misc/{tool}.py", CFG,
          "--which-set", "val", "--output-dir", str(out),
          "--num", "2", "--platform", "cpu",
          "--cfg-options", *_data_opts(synth)])
    files = os.listdir(out)
    assert len(files) >= 1, files
    assert all(os.path.getsize(out / f) > 0 for f in files)


def test_heatmap_raw_image(tmp_path):
    """heatmap.py: single RAW image + free-text expression -> CAM
    overlay with the predicted box + score drawn (reference
    tools/misc/heatmap.py plot_cam_image semantics, not a dataset
    sweep)."""
    import cv2
    import numpy as np

    img = np.random.default_rng(0).integers(
        0, 255, (90, 120, 3), np.uint8)
    cv2.rectangle(img, (20, 20), (60, 60), (0, 255, 0), -1)
    path = str(tmp_path / "raw.jpg")
    cv2.imwrite(path, img)
    out = tmp_path / "cam"
    proc = _run([sys.executable, "tools/misc/heatmap.py", CFG,
                 "--image-path", path, "--text", "the green box",
                 "--save-dir", str(out), "--branch", "decoder",
                 "--platform", "cpu"])
    # printed contract: box in ORIGINAL-image scale + score
    m = re.search(r"box \(xyxy, original scale\): \[([^\]]+)\] "
                  r"score: ([\d.]+)", proc.stdout)
    assert m, proc.stdout
    box = [float(v) for v in m.group(1).split(",")]
    assert all(np.isfinite(box)) and max(box) <= 120 + 1e-3
    files = os.listdir(out)
    assert files and os.path.getsize(out / files[0]) > 0
    assert "decoder-heatmap" in files[0]


def test_parity_probe_on_tiny_fixture():
    """Per-layer torch-vs-JAX diff on the checked-in miniature .pth:
    every layer diff must be at fp32 noise level (the tool's purpose is
    localizing conversion bugs, so nonzero-but-tiny is the pass)."""
    proc = _run([sys.executable, "tools/misc/parity_probe.py",
                 "tests/fixtures/beit3_pretrain_tiny.pth",
                 "--img-size", "64", "--patch-size", "16",
                 "--heads", "4", "--max-token", "8",
                 "--platform", "cpu"], timeout=900)
    m = re.search(r"worst layer: \d+ \(max abs diff ([0-9.e+-]+)\)",
                  proc.stdout)
    assert m, proc.stdout[-1500:]
    assert float(m.group(1)) < 1e-4, proc.stdout[-1500:]


def test_vis_cam_onestage_family(synth, tmp_path):
    """GradCAM for the SeqTR-style OneStageModel family (reference
    utils/gradcam_models.py GradCAM_SeqTR): CAM on the zoo backbone's
    feature map through the lan_enc+fusion+DETR-head scoring stack."""
    out = tmp_path / "cam_onestage"
    _run([sys.executable, "tools/misc/vis_cam.py",
          "configs/smoke/tiny_synth_onestage.py",
          "--which-set", "val", "--output-dir", str(out),
          "--num", "2", "--platform", "cpu",
          "--cfg-options", *_data_opts(synth)])
    files = os.listdir(out)
    assert len(files) >= 1, files
    assert all(os.path.getsize(out / f) > 0 for f in files)


def test_summarize_run(tmp_path):
    """summarize_run.py digests a metrics.jsonl stream: per-split
    dedup keeps the LAST emission of a re-run epoch (resume semantics),
    best-vs-final rows, torn trailing line ignored."""
    wd = tmp_path / "runA"
    wd.mkdir()
    rows = [
        {"kind": "train", "epoch": 1, "iter": 4, "loss_total": 9.0},
        {"kind": "eval", "split": "val", "epoch": 10,
         "decoder_det_acc": 50.0, "decoder_miou": 49.3,
         "token_det_acc": 0.0, "token_miou": 10.9},
        # resume re-emits epoch 10 with different numbers: last wins
        {"kind": "eval", "split": "val", "epoch": 10,
         "decoder_det_acc": 55.0, "decoder_miou": 51.0,
         "token_det_acc": 1.0, "token_miou": 11.0},
        {"kind": "eval", "split": "val", "epoch": 20,
         "decoder_det_acc": 90.0, "decoder_miou": 80.0,
         "token_det_acc": 40.0, "token_miou": 35.0},
        {"kind": "eval", "split": "val", "epoch": 30,
         "decoder_det_acc": 95.0, "decoder_miou": 85.0,
         "token_det_acc": 30.0, "token_miou": 30.0},
    ]
    with open(wd / "metrics.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write('{"kind": "eval", "epo')  # torn write mid-crash

    proc = _run([sys.executable, "tools/misc/summarize_run.py",
                 str(wd), "--key", "token_det_acc"])
    out = proc.stdout
    assert "(3 evals)" in out, out            # epochs 10, 20, 30
    assert "final epoch   30" in out, out
    # best-by-token is epoch 20, and epoch 10 shows the LAST emission
    assert "best(token_det_acc) epoch   20" in out, out
    assert "token_det_acc=40.00" in out, out

    # empty dir: reported, not crashed
    wd2 = tmp_path / "runB"
    wd2.mkdir()
    proc = _run([sys.executable, "tools/misc/summarize_run.py",
                 str(wd2)])
    assert "no eval rows" in proc.stdout
