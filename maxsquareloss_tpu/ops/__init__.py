from maxsquareloss_tpu.ops.resize import (
    interp_matrix,
    resize_bilinear_align_corners,
    upsample_logits,
)
from maxsquareloss_tpu.ops.histogram import class_histogram, iw_class_weights
from maxsquareloss_tpu.ops.losses import (
    cross_entropy,
    entropy_loss,
    iw_entropy_loss,
    iw_max_square_loss,
    max_square_loss,
    self_produced_guidance,
    soft_cross_entropy,
)
