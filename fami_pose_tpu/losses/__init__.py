from .heatmap import joint_mse_loss, fami_total_loss, build_loss
