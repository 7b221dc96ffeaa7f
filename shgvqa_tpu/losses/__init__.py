from shgvqa_tpu.losses.set_prediction import (  # noqa: F401
    hungarian_set_loss,
    weighted_cross_entropy,
    matched_top1_accuracy,
)
from shgvqa_tpu.losses.vqa import bce_vqa_loss, mce_vqa_loss  # noqa: F401
