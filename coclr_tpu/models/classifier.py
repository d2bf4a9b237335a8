"""Linear/finetune classifier head.

Parity: /root/reference/model/classifier.py:10-68 — backbone + avgpool +
optional L2-norm + optional final BN (BatchNorm1d) + dropout + FC; returns
(logit, pooled_feature). Head init: weight ~ N(0, 0.01), bias = 0
(classifier.py:63-68).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from coclr_tpu.backbones import select_backbone
from coclr_tpu.backbones.norm import FoldedBatchNorm


class LinearClassifier(nn.Module):
    """`sp_axis`: sequence-parallel mesh axes (ops/seqpar.py: None, bare
    temporal axis name, or SPAxes(t, h)) — the backbone runs on the local
    T/H chunk and the pooled feature pmeans over the sp axes, so the head
    (l2/final_bn/dropout/fc) sees the identical replicated feature on
    every sp member (no sync needed there)."""

    num_class: int = 101
    network: str = "s3d"
    dropout: float = 0.5
    use_dropout: bool = True
    use_l2_norm: bool = False
    use_final_bn: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    sp_axis: object = None  # str | SPAxes | None (seqpar.sp_axes spec)

    def setup(self):
        self.backbone, self.param = select_backbone(
            self.network, dtype=self.dtype, sp_axis=self.sp_axis)
        if self.use_final_bn:
            # torch BatchNorm1d semantics incl. the unbiased running-var
            # update; gamma=1 beta=0 (classifier.py:33-36)
            self.final_bn = FoldedBatchNorm(dtype=jnp.float32,
                                            name="final_bn")
        self.final_fc = nn.Dense(
            self.num_class,
            kernel_init=nn.initializers.normal(stddev=0.01),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32, name="final_fc")
        if self.use_dropout:
            self.drop = nn.Dropout(rate=self.dropout)

    def __call__(self, x, train: bool = False, train_backbone=None):
        """x: [B, T, H, W, C]; returns (logits [B, num_class], feat [B, fs]).

        train_backbone lets the linear-probe path keep backbone BN in eval
        mode while final_bn keeps training (eval/main_classifier.py:473-476:
        model.eval() + final_bn.train())."""
        if train_backbone is None:
            train_backbone = train
        from coclr_tpu.ops.seqpar import sp_pmean

        feat = self.backbone(x, train=train_backbone)
        feat = jnp.mean(feat.astype(jnp.float32), axis=(1, 2, 3))
        feat = sp_pmean(
            feat, None if self.is_initializing() else self.sp_axis)

        if self.use_l2_norm:
            feat = feat / jnp.maximum(
                jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)

        h = feat
        if self.use_final_bn:
            h = self.final_bn(h, use_running_average=not train)
        if self.use_dropout:
            h = self.drop(h, deterministic=not train)
        logit = self.final_fc(h)
        return logit, feat
