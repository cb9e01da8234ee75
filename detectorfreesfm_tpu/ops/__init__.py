from . import attention, dsnt, dual_softmax, grid_merge, roi_align  # noqa: F401
