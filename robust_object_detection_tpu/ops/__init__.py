from . import boxes, corrupt, image, nms, ssim  # noqa: F401
