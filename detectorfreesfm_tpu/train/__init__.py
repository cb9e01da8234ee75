from .losses import coarse_focal_loss, fine_l2_std_loss  # noqa: F401
