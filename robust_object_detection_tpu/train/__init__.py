"""Training drivers: restoration U-Net, detector training (baseline and
corruption-augmented), all as sharded jitted steps over a device mesh."""
