"""Raw-source preprocessing shared by tools/demo.py and tools/serve.py.

The reference runs its demo through the val pipeline on a fabricated
annotation record (``LoadFromRawSource``, /root/reference/tools/
demo.py:57-75).  This module is the single place that fabricates that
record for OUR pipeline, so the demo CLI and the serving server cannot
drift from each other (or from the dataset loader's contract) when the
sample schema changes.

``normalize_on_device`` configs are honoured: the host Normalize op is
skipped (images stay uint8) and ``device_norm`` carries the
``img_norm_cfg`` the eval step must fuse into the forward
(engine.train.make_eval_step(device_norm=...)).
"""

from __future__ import annotations

import numpy as np


class RawPreprocessor:
    """(BGR image, expression) -> pipeline sample dict.

    Built from a full config (the same keys tools/test.py reads):
    ``val_pipeline``, ``max_token``, ``tokenizer_spm``,
    ``normalize_on_device``, ``img_norm_cfg``.
    """

    def __init__(self, cfg):
        from simvg_tpu.data.builder import build_pipeline
        from simvg_tpu.data.tokenization import build_tokenizer

        norm_on_device = cfg.get("normalize_on_device", False)
        self.tfs, load_cfg = build_pipeline(
            cfg.get("val_pipeline", []),
            normalize_on_device=norm_on_device)
        self.max_token = load_cfg.get("max_token",
                                      cfg.get("max_token", 20))
        # same tokenizer resolution as the datasets (builder.py): the
        # spm path lives in the pipeline's load op, with the same
        # default — a mismatched vocab would silently feed garbage ids
        # into a model trained with the real beit3.spm
        self.tokenizer = build_tokenizer(
            load_cfg.get("use_token_type", "beit3"),
            spm_path=load_cfg.get("spm_path",
                                  cfg.get("tokenizer_spm")
                                  or "pretrain_weights/beit3.spm"),
        )
        # what the jitted eval step must fuse when the host pipeline
        # left images unnormalized
        self.device_norm = (dict(cfg.get("img_norm_cfg", {})) or None) \
            if norm_on_device else None

    def __call__(self, img_bgr: np.ndarray, expression: str,
                 filename: str = "<raw>") -> dict:
        ids, mask = self.tokenizer.encode(expression, self.max_token)
        s = {
            "img": img_bgr,
            "ori_shape": img_bgr.shape,
            "img_shape": img_bgr.shape,
            "pad_shape": img_bgr.shape,
            "scale_factor": np.ones(4, np.float32),
            "with_bbox": False,
            "with_mask": False,
            "filename": filename,
            "expression": expression,
            "ref_expr_inds": ids,
            "text_attention_mask": mask,
        }
        for t in self.tfs:
            s = t(s)
        return s
