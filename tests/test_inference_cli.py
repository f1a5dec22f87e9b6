"""E2E: tools/inference.py writes box visualisations and (with
--with-attn) decoder cross-attention overlays (reference
tools/inference.py + simvg/apis/inference.py:20-140, attention dump
107-137)."""

import os
import subprocess
import sys

import jax
import pytest

from util_synth import make_refcoco_style

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def smoke_ckpt(tmp_path_factory):
    """A checkpoint in the CLI's on-disk format, from a 1-epoch smoke
    train on synthetic data."""
    root = tmp_path_factory.mktemp("synth")
    make_refcoco_style(str(root), n_train=32, n_val=8)
    work = tmp_path_factory.mktemp("work")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/train.py", "configs/smoke/tiny_synth.py",
        "--platform", "cpu", "--work-dir", str(work),
        "--cfg-options",
        "scheduler_config.max_epoch=1", "evaluate_interval=5",
        "ema=False", "data.samples_per_gpu=2",
        f"data.train.annsfile={root}/instances.json",
        f"data.train.imgsfile={root}/images",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return root, os.path.join(str(work), "latest")


def test_inference_cli_writes_boxes_and_attention(smoke_ckpt, tmp_path):
    root, ckpt = smoke_ckpt
    out = tmp_path / "vis"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/inference.py",
        "configs/smoke/tiny_synth.py", ckpt,
        "--which-set", "val", "--output-dir", str(out),
        "--with-attn", "--max-images", "3", "--platform", "cpu",
        "--cfg-options",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    files = sorted(os.listdir(out))
    boxes = [f for f in files if not f.endswith("_attn.jpg")]
    attns = [f for f in files if f.endswith("_attn.jpg")]
    assert len(boxes) == 3 and len(attns) == 3, files
    assert all(os.path.getsize(out / f) > 0 for f in files)


def test_test_cli_multi_split_eval(smoke_ckpt, tmp_path):
    """tools/test.py end-to-end: multi-split eval from a checkpoint
    (reference tools/test.py:20-134), with EMA absent (ema=False run)."""
    root, ckpt = smoke_ckpt
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/test.py",
        "configs/smoke/tiny_synth.py", ckpt, "--platform", "cpu",
        "--cfg-options",
        f"data.train.annsfile={root}/instances.json",
        f"data.train.imgsfile={root}/images",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "[val]" in proc.stderr or "[val]" in proc.stdout, (
        proc.stdout[-500:], proc.stderr[-500:])


def test_inference_cli_token_prune(smoke_ckpt, tmp_path):
    """Token-pruned serving through the real CLI: a FULL training
    checkpoint restores into the pruned model (pruning is a serving
    flag, not a different param tree) and the token branch serves."""
    root, ckpt = smoke_ckpt
    out = tmp_path / "vis"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/inference.py",
        "configs/smoke/tiny_synth.py", ckpt,
        "--which-set", "val", "--output-dir", str(out),
        "--max-images", "2", "--platform", "cpu",
        "--cfg-options", "model.vis_enc.token_prune_keep=9",
        # 2-layer/16-patch tiny model is outside the measured accuracy
        # envelope by construction; this test drives restore mechanics
        "model.vis_enc.token_prune_force=True",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    files = [f for f in os.listdir(out) if not f.endswith("_attn.jpg")]
    assert len(files) == 2, files


def test_demo_cli_single_image(smoke_ckpt, tmp_path):
    """tools/demo.py end-to-end (reference tools/demo.py:16-121): one
    raw image + free-text expression through the shared RawPreprocessor
    (data/raw.py) -> box in ORIGINAL image coordinates + visualization."""
    import cv2
    import numpy as np

    root, ckpt = smoke_ckpt
    img_file = str(tmp_path / "raw.jpg")
    h, w = 96, 128  # non-square: exercises the rescale-to-original path
    cv2.imwrite(img_file, np.random.default_rng(3).integers(
        0, 255, (h, w, 3), np.uint8))
    out = tmp_path / "demo_out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "tools/demo.py",
        "--config", "configs/smoke/tiny_synth.py",
        "--checkpoint", ckpt, "--img", img_file,
        "--expression", "the red box",
        "--output-dir", str(out), "--platform", "cpu",
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    vis = out / "raw_pred.jpg"
    assert vis.exists() and os.path.getsize(vis) > 0
    # the printed box is in original-image scale
    import re

    m = re.search(r"box \(xyxy, original scale\): \[([^\]]+)\]",
                  proc.stdout)
    assert m, proc.stdout[-500:]
    box = [float(x) for x in m.group(1).split(",")]
    assert all(np.isfinite(box))
    assert 0 <= max(box) <= max(h, w) + 1


def test_int8_static_calibrate_then_eval(smoke_ckpt, tmp_path):
    """Serving quantization e2e (ops/quant.py, no reference analogue):
    tools/misc/quantize_serving.py calibrates an int8_static artifact
    from the trained checkpoint, then tools/test.py evaluates with
    model.vis_enc.quant=int8_static --quant-collection."""
    import json

    root, ckpt = smoke_ckpt
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    npz = tmp_path / "qcol.npz"
    data_opts = [
        f"data.train.annsfile={root}/instances.json",
        f"data.train.imgsfile={root}/images",
        f"data.val.annsfile={root}/instances.json",
        f"data.val.imgsfile={root}/images",
    ]
    cmd = [
        sys.executable, "tools/misc/quantize_serving.py",
        "configs/smoke/tiny_synth.py", ckpt, "--platform", "cpu",
        "--num-batches", "2", "--out", str(npz),
        "--cfg-options", *data_opts,
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["quantized_layers"] > 0
    assert stats["act_amax_max"] > 0  # calibration actually observed x
    assert os.path.getsize(npz) > 0

    cmd = [
        sys.executable, "tools/test.py",
        "configs/smoke/tiny_synth.py", ckpt, "--platform", "cpu",
        "--quant-collection", str(npz),
        "--cfg-options", "model.vis_enc.quant=int8_static", *data_opts,
    ]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "[val]" in proc.stderr or "[val]" in proc.stdout, (
        proc.stdout[-500:], proc.stderr[-500:])
