from .heatmap import joint_mse_loss, fami_total_loss, build_loss
from .optional import (
    integral_l1_loss,
    structure_cosine_loss,
    soft_argmax,
)
