"""robust_object_detection_tpu — a TPU-native robustness framework for object detection.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo ysbbin/Robust-Object-Detection (PyTorch/CUDA, single GPU):

  * image-corruption ops (gaussian noise sigma=15, motion blur k=9, 0.5x lowres)
    as batched on-device kernels (reference: scripts/augmentations.py),
  * VisDrone-DET / VisDrone-VID dataset conversion to COCO/YOLO layouts
    (reference: scripts/convert_visdrone_to_{coco,yolo}.py),
  * frozen corrupted testsets (reference: scripts/build_corrupted_testsets.py),
  * a 3.7M-parameter restoration U-Net (reference: scripts/restoration_net.py),
  * three detector families — Faster R-CNN R50-FPNv2, YOLOv8m, RT-DETR-L —
    implemented in Flax with batched decode + NMS,
  * a COCOeval-compatible mAP scorer (the reference leans on pycocotools),
  * sharded data-parallel training and evaluation over a jax.sharding.Mesh,
  * reporting: tables, figures, demo strips (reference: scripts/plot_*.py).

Everything under `jit` uses static shapes; variable-length structures
(detections, ground-truth boxes) are fixed-capacity padded arrays with
validity masks end to end.
"""

__version__ = "0.1.0"
