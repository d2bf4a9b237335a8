"""Backbone registry — parity with /root/reference/backbone/select_backbone.py:4-16."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from coclr_tpu.backbones.s3d import S3D, BasicConv3d
from coclr_tpu.backbones.resnet2d3d import ResNet2d3d, r2d3d50, r3d50

__all__ = ["select_backbone", "S3D", "ResNet2d3d", "r2d3d50", "r3d50",
           "TinyBackbone"]


class TinyBackbone(nn.Module):
    """Two-conv backbone with BatchNorm; exercises every code path the big
    backbones use (conv/BN/pool/stats) at CPU-test speed."""

    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = BasicConv3d(16, (1, 3, 3), (1, 2, 2), (0, 1, 1), self.dtype,
                        sp_axis=self.sp_axis, name="c1")(x, train)
        x = BasicConv3d(32, (3, 3, 3), (2, 2, 2), (1, 1, 1), self.dtype,
                        sp_axis=self.sp_axis, name="c2")(x, train)
        return x


def select_backbone(network: str, first_channel: int = 3,
                    dtype=jnp.bfloat16,
                    sp_axis=None) -> Tuple[nn.Module, dict]:
    """Return (module, {'feature_size': int}) like the reference registry.

    `sp_axis`: sequence-parallel mesh axes (ops/seqpar.py: None, bare
    temporal axis name, or SPAxes(t, h)) — supported by every registered
    backbone, spatial included.
    """
    import os

    # COCLR_S2D_STEM=1: exact space-to-depth RGB stem (same canonical
    # parameter, so checkpoints are unchanged) — see s3d.SpaceToDepthConv.
    # =2: additionally the pretrain aug pipeline emits pre-packed clips
    # (ops/augment.py emit_s2d), skipping the on-device repack conv; the
    # stem auto-detects raw vs packed input, so eval paths keep working.
    s2d = os.environ.get("COCLR_S2D_STEM") not in (None, "", "0")
    param = {"feature_size": 1024}
    if network == "s3d":
        model = S3D(input_channel=first_channel, gating=False, dtype=dtype,
                    s2d_stem=s2d, sp_axis=sp_axis)
    elif network == "s3dg":
        model = S3D(input_channel=first_channel, gating=True, dtype=dtype,
                    s2d_stem=s2d, sp_axis=sp_axis)
    elif network == "r50":
        param["feature_size"] = 2048
        model = r2d3d50(input_channel=first_channel, dtype=dtype,
                        sp_axis=sp_axis)
    elif network == "r3d50":
        param["feature_size"] = 2048
        model = r3d50(input_channel=first_channel, dtype=dtype,
                      sp_axis=sp_axis)
    elif network == "tiny":
        # minimal BN-bearing backbone for fast CPU tests / dry runs
        param["feature_size"] = 32
        model = TinyBackbone(dtype=dtype, sp_axis=sp_axis)
    else:
        raise ValueError(f"unknown backbone: {network!r}")
    return model, param
