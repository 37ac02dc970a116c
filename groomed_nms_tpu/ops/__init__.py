from . import boxes, geometry, iou, groomed_nms, nms  # noqa: F401
