import os.path as osp

from simvg_tpu.config import Config

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_base_inheritance_merges_parent_keys():
    cfg = Config.fromfile(
        osp.join(REPO, "configs/smoke/tiny_synth_grec.py")
    )
    # child keys
    assert cfg.dataset == "GRefCOCO"
    assert cfg.max_gt == 4
    # parent keys must survive the merge (regression: _base_ was filtered
    # out by the underscore rule)
    assert cfg.img_size == 64
    assert cfg.model.head.num_queries == 10  # child override
    assert cfg.model.head.embed_dim == 64  # parent value kept
    assert "pipeline" in cfg.data.train  # parent pipeline kept
    assert cfg.data.train.annsfile.startswith("/tmp/simvg_tpu_synth_grec")


def test_reference_style_config_loads():
    cfg = Config.fromfile(
        osp.join(REPO,
                 "configs/single/ViT-base/refcoco/refcoco_onestage.py")
    )
    assert cfg.model.vis_enc.vit_type == "base"
    assert cfg.model.head.branch_loss_weight["balanced_distill"][
        "token"] == 2.0
    assert cfg.scheduler_config.decay_steps == [25]
    assert cfg.ema is False  # leaf overrides _base_/misc.py's True
    assert cfg.optimizer_config.lr_vis_enc == cfg.optimizer_config.lr / 10


def test_merge_from_dict_dotted():
    cfg = Config.fromfile(
        osp.join(REPO, "configs/smoke/tiny_synth.py")
    )
    cfg.merge_from_dict({"model.head.num_queries": 5, "lr": 0.1})
    assert cfg.model.head.num_queries == 5
    assert cfg.lr == 0.1


def test_all_shipped_configs_load_and_carry_reference_deltas():
    """Every config in the tree must parse; spot-check the regime deltas
    that distinguish the families (reference configs/ inventory,
    SURVEY.md section 2.7)."""
    import glob
    import os.path as osp

    root = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "configs")
    leaves = [f for f in glob.glob(root + "/**/*.py", recursive=True)
              if "/_base_/" not in f]
    assert len(leaves) >= 55, len(leaves)
    for f in leaves:
        cfg = Config.fromfile(f)
        assert "model" in cfg, f

    large_t1 = Config.fromfile(
        root + "/single/ViT-large/referit/referit_twostage_1.py")
    assert large_t1.model["head"]["branch_loss_weight"] == {
        "decoder": 1.0}
    assert large_t1.data["samples_per_gpu"] == 4
    large_os = Config.fromfile(
        root + "/single/ViT-large/flickr/flickr_onestage.py")
    assert large_os.model["head"]["branch_loss_weight"][
        "balanced_distill"] == {"token": 1.0, "distill": 0.4}
    ft = Config.fromfile(root + "/mix/ViT-base/finetune_mix/refcoco.py")
    assert ft.lr == 0.0001 and ft.scheduler_config["max_epoch"] == 10
    ca = Config.fromfile(root + "/mix/ViT-base/pretrain-cocoall.py")
    assert ca.img_size == 512


def test_672_lever_config_composes():
    """Perf-lever variant (VERDICT r2 #3): inherits the flagship recipe,
    overrides only the geometry to 672 (21x21 grid)."""
    from simvg_tpu.config import Config

    c = Config.fromfile(
        "configs/single/ViT-base/refcoco/refcoco_onestage_672.py")
    assert c["img_size"] == 672
    assert c["model"]["vis_enc"]["img_size"] == 672
    # recipe inherited from refcoco_onestage.py
    assert c["model"]["vis_enc"]["attn_impl"] == "pallas"
    # unrolled no-remat is the shipped train recipe since r4
    # (ROADMAP "Training floor": 283 vs 226 img/s)
    assert c["model"]["vis_enc"]["scan_layers"] is False
    assert c["model"]["vis_enc"]["remat"] is False
    assert c["data"]["samples_per_gpu"] == 32
    for split in ("train", "val", "testA", "testB"):
        ops = {op["type"]: op for op in c["data"][split]["pipeline"]}
        assert ops["Resize"]["img_scale"] == (672, 672)
