from .boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_area,
    box_iou_pairwise,
    box_iou_aligned,
    generalized_box_iou_pairwise,
    clip_boxes,
)
from .hungarian import hungarian_assign
from .sine_embed import sine_position_embedding_2d, sine_position_embedding_1d_ref

__all__ = [
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_area",
    "box_iou_pairwise",
    "box_iou_aligned",
    "generalized_box_iou_pairwise",
    "clip_boxes",
    "hungarian_assign",
    "sine_position_embedding_2d",
    "sine_position_embedding_1d_ref",
]
