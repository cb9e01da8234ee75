from . import pose_auc, pointcloud  # noqa: F401
