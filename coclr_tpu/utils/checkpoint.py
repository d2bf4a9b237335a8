"""Checkpoint IO: flax-msgpack native format with the reference's rotation
semantics (single-file checkpoints, like the reference's torch.save; torch
.pth.tar interop lives in coclr_tpu/utils/torch_interop.py).

Rotation parity (utils/utils.py:12-26): saving epoch N deletes epoch N-gap
(unless keep_all) and keeps at most 5 `model_best_*` files.
Load modes parity (main_nce.py:215-246): resume (full state), pretrain
(weights only, tolerant), and CoCLR's two-checkpoint surgery
(main_coclr.py:250-302) implemented in coclr_tpu/train/init_surgery.py.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(payload: Dict[str, Any], is_best: bool = False,
                    gap: int = 1, filename: str = "models/checkpoint.ckpt",
                    keep_all: bool = False):
    """payload: {'epoch', 'state', 'opt_state', 'best_acc', 'iteration'}.

    `state`/`opt_state` are pytrees; serialized with flax msgpack inside a
    small pickle envelope (structure template is rebuilt at load time from a
    freshly-initialized state, like flax convention).
    """
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    blob = {}
    for k, v in payload.items():
        if k in ("state", "opt_state"):
            blob[k] = serialization.to_bytes(_to_numpy(v))
        else:
            blob[k] = v
    with open(filename, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)

    epoch = payload.get("epoch", 0)
    stem = _epoch_stem(filename)
    if not keep_all and stem is not None:
        prev = stem % (epoch - gap)
        try:
            os.remove(prev)
        except OSError:
            pass

    if is_best:
        d = os.path.dirname(os.path.abspath(filename))
        ext = os.path.splitext(filename)[1]
        past_best = sorted(
            glob.glob(os.path.join(d, "model_best_*" + ext)),
            key=lambda x: int("".join(filter(str.isdigit, os.path.basename(x)))))
        if len(past_best) >= 5:
            try:
                os.remove(past_best[0])
            except OSError:
                pass
        best_name = os.path.join(d, "model_best_epoch%d%s" % (epoch, ext))
        with open(best_name, "wb") as f:
            pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def _epoch_stem(filename: str) -> Optional[str]:
    m = re.match(r"(.*epoch)(\d+)(\..*)$", filename)
    if not m:
        return None
    return m.group(1) + "%d" + m.group(3)


def load_checkpoint(filename: str, state_template=None, opt_template=None
                    ) -> Dict[str, Any]:
    """Inverse of save_checkpoint. With templates, pytrees are restored to
    their original structure/dtypes; without, raw msgpack dicts are returned."""
    with open(filename, "rb") as f:
        blob = pickle.load(f)
    out = dict(blob)
    if "state" in blob:
        if state_template is not None:
            out["state"] = serialization.from_bytes(state_template, blob["state"])
        else:
            out["state"] = serialization.msgpack_restore(blob["state"])
    if "opt_state" in blob:
        if opt_template is not None:
            out["opt_state"] = serialization.from_bytes(opt_template,
                                                        blob["opt_state"])
        else:
            out["opt_state"] = serialization.msgpack_restore(blob["opt_state"])
    return out


def neq_load(template_tree, loaded_tree, verbose: bool = True):
    """Tolerant partial load (neq_load_customized, utils/utils.py:88-112):
    copy leaves present in both (by path), report the diff."""
    from flax import traverse_util

    flat_t = traverse_util.flatten_dict(
        serialization.to_state_dict(template_tree))
    flat_l = traverse_util.flatten_dict(
        serialization.to_state_dict(loaded_tree))
    used, missing = [], []
    out = dict(flat_t)
    for k, v in flat_l.items():
        if k in flat_t:
            out[k] = v
            used.append(k)
    for k in flat_t:
        if k not in flat_l:
            missing.append(k)
    if verbose:
        print("=======Check Weights Loading======")
        print("Weights not used from pretrained file:",
              [k for k in flat_l if k not in flat_t])
        print("Weights not loaded into new model:", missing)
        print("===================================")
    restored = traverse_util.unflatten_dict(out)
    return serialization.from_state_dict(template_tree, restored)
