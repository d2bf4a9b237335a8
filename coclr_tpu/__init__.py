"""coclr_tpu — TPU-native video self-supervised learning framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
TengdaHan/CoCLR (NeurIPS 2020): InfoNCE / UberNCE / CoCLR pretraining on video
clips, S3D / ResNet-2d3d backbones, an LMDB+msgpack data plane, on-device
augmentation, and the full evaluation suite (finetune, linear probe,
NN retrieval, 10-crop TTA, two-stream fusion).
"""

__version__ = "0.1.0"

# Make the JAX_PLATFORMS env var authoritative. Some images (the axon dev
# image) register an out-of-tree TPU plugin through a site hook that wins
# over the env var at backend-resolution time; the jax config knob wins over
# the hook. Without this, `JAX_PLATFORMS=cpu python main_nce.py ...` (the
# documented CPU test recipe, used by tests/test_cli.py subprocesses) lands
# on the real TPU. Only acts when the env var is explicitly set.
_env_platforms = __import__("os").environ.get("JAX_PLATFORMS")
if _env_platforms:
    import jax as _jax

    if _jax.config.jax_platforms != _env_platforms:
        _jax.config.update("jax_platforms", _env_platforms)
del _env_platforms
