"""Checkpoint initialization paths for pretraining.

Parity targets:
  - --pretrain (weights only, tolerant): main_nce.py:234-243
  - CoCLR two-checkpoint surgery:        main_coclr.py:250-302
      ckpt[1].encoder_q -> sampler (frozen oracle)
      ckpt[0].encoder_q -> encoder_q AND encoder_k
      queues stripped; queue_label always deleted (re-fill)

Both our native checkpoints and reference torch `.pth.tar` files are accepted;
torch state_dicts go through coclr_tpu.utils.torch_interop.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from coclr_tpu.models.moco import MoCoState
from coclr_tpu.utils import torch_interop
from coclr_tpu.utils.checkpoint import checkpoint_exists, load_checkpoint


def _is_torch_ckpt(path: str) -> bool:
    return path.endswith((".pth", ".pth.tar", ".pt"))


def load_encoder_q(path: str, state_template: MoCoState):
    """Extract (params, stats) of encoder_q from a checkpoint of either
    format. Returns None if the file is missing."""
    if not checkpoint_exists(path):
        return None
    if _is_torch_ckpt(path):
        ckpt = torch_interop.load_torch_checkpoint(path)
        variables = torch_interop.flax_from_torch_proj_encoder(
            ckpt["state_dict"], "encoder_q.")
        return variables["params"], variables["batch_stats"]
    # restore without a template: the source state may be a different variant
    # (e.g. InfoNCE ckpt feeding a CoCLR sampler), only encoder_q is taken
    ckpt = load_checkpoint(path)
    st = ckpt["state"]
    return st["params_q"], st["stats_q"]


def init_pretrain_weights(state: MoCoState, path: str) -> MoCoState:
    """--pretrain for main_nce: load encoder weights, keep fresh queues
    (reference loads the full state_dict tolerantly; queues in the file are
    accepted but we deliberately refresh optimizer/queue state like a
    weights-only load)."""
    loaded = load_encoder_q(path, state)
    if loaded is None:
        print(f"=> no checkpoint found at '{path}', use random init")
        return state
    params, stats = loaded
    print(f"=> loaded pretrained encoder_q from '{path}' into q and k")
    copy = jax.tree_util.tree_map(lambda x: x, params)
    stats_copy = jax.tree_util.tree_map(lambda x: x, stats)
    return state.replace(params_q=params, stats_q=stats,
                         params_k=copy, stats_k=stats_copy)


def coclr_surgery(state: MoCoState, pretrain_paths: Tuple[str, str]
                  ) -> MoCoState:
    """Two-checkpoint CoCLR init (main_coclr.py:250-302)."""
    first, second = pretrain_paths
    upd = {}

    loaded = load_encoder_q(second, state)
    if loaded is not None:
        params_s, stats_s = loaded
        print(f"=> Use Oracle checkpoint '{second}' (-> sampler)")
        upd["params_s"] = params_s
        upd["stats_s"] = stats_s
    else:
        print(f"=> NO Oracle checkpoint found at '{second}', use random init")

    loaded = load_encoder_q(first, state)
    if loaded is not None:
        params_q, stats_q = loaded
        print(f"=> Use Training checkpoint '{first}' (-> encoder_q, encoder_k)")
        upd["params_q"] = params_q
        upd["stats_q"] = stats_q
        upd["params_k"] = jax.tree_util.tree_map(lambda x: x, params_q)
        upd["stats_k"] = jax.tree_util.tree_map(lambda x: x, stats_q)
    else:
        print(f"=> NO Training checkpoint found at '{first}', use random init")

    # queues are never imported; queue_label stays -1 so the fill-gate holds
    # (main_coclr.py:298-301)
    return state.replace(**upd)
