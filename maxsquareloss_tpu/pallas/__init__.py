from maxsquareloss_tpu.pallas.fused_loss import (
    fused_iw_max_square_loss,
    fused_max_square_loss,
)
