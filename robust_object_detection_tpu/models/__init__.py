"""Model zoo: restoration U-Net, YOLOv8, Faster R-CNN R50-FPNv2, RT-DETR-L.

All models are Flax modules over NHWC arrays with static shapes; detector
outputs are fixed-capacity padded boxes with validity masks (SURVEY.md §7.3
hard part 5).
"""
