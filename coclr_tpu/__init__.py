"""coclr_tpu — TPU-native video self-supervised learning framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
TengdaHan/CoCLR (NeurIPS 2020): InfoNCE / UberNCE / CoCLR pretraining on video
clips, S3D / ResNet-2d3d backbones, an LMDB+msgpack data plane, on-device
augmentation, and the full evaluation suite (finetune, linear probe,
NN retrieval, 10-crop TTA, two-stream fusion).
"""

__version__ = "0.1.0"
