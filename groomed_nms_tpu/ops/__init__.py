from . import boxes, geometry, iou, groomed_nms, nms, refine, roi_align  # noqa: F401
