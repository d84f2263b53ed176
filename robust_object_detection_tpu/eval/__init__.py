from . import coco_map  # noqa: F401
