"""Data layer: VisDrone parsing, COCO/YOLO conversion, frozen testsets,
fixed-shape batched pipelines for TPU."""
