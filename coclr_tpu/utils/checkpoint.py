"""Checkpoint IO: flax-msgpack native format with the reference's rotation
semantics (single-file checkpoints, like the reference's torch.save; torch
.pth.tar interop lives in coclr_tpu/utils/torch_interop.py).

Rotation parity (utils/utils.py:12-26): saving epoch N deletes epoch N-gap
(unless keep_all) and keeps at most 5 `model_best_*` files.
Load modes parity (main_nce.py:215-246): resume (full state), pretrain
(weights only, tolerant), and CoCLR's two-checkpoint surgery
(main_coclr.py:250-302) implemented in coclr_tpu/train/init_surgery.py.

Orbax backend (`fmt="orbax"`, SURVEY §5.4 build note): same payload and
rotation semantics, written as an Orbax StandardCheckpointer directory per
checkpoint. Sharded `jax.Array` leaves are saved shard-wise (multi-host
safe) and restored onto whatever sharding the load-time templates carry —
resume works across a different device count/mesh, which the single-file
format only supports for fully replicated state. `load_checkpoint`
auto-detects the format from the path, so every load site (resume,
--pretrain, CoCLR surgery, eval --test) accepts either.
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


_ORBAX_SENTINEL = "_CHECKPOINT_METADATA"  # file orbax writes in every ckpt dir


def is_orbax_checkpoint(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, _ORBAX_SENTINEL))


def checkpoint_exists(path: str) -> bool:
    """True for a flax-msgpack file OR an orbax checkpoint directory.

    Call sites that used `os.path.isfile` (resume/pretrain/test gates) use
    this so orbax checkpoints — which are directories — pass the gate.
    """
    return os.path.isfile(path) or is_orbax_checkpoint(path)


def _std_checkpointer():
    import orbax.checkpoint as ocp
    if jax.process_count() > 1:
        # Checkpoint IO here is primary-only-with-broadcast (train/pretrain
        # .py): the payload is device_get numpy, ONE process calls save/
        # restore, others never enter. Orbax's default Checkpointer assumes
        # all processes participate and runs sync_global_devices barriers
        # ('_Checkpointer:save_start'), which collide with the other ranks'
        # next real collective (found by tests/test_multihost.py::
        # test_multihost_orbax_cross_mesh_resume: AssertionError
        # 'sync_global_devices name mismatch'). Scope orbax to the calling
        # process so no cross-host barrier is issued.
        me = jax.process_index()
        mp = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"coclr_p{me}")
        return ocp.StandardCheckpointer(multiprocessing_options=mp)
    return ocp.StandardCheckpointer()


def _remove_ckpt(path: str):
    import shutil
    try:
        if os.path.isdir(path):
            shutil.rmtree(path)
        else:
            os.remove(path)
    except OSError:
        pass


def _copy_ckpt(src: str, dst: str):
    import shutil
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)


def save_checkpoint(payload: Dict[str, Any], is_best: bool = False,
                    gap: int = 1, filename: str = "models/checkpoint.ckpt",
                    keep_all: bool = False, fmt: str = "flax"):
    """payload: {'epoch', 'state', 'opt_state', 'best_acc', 'iteration'}.

    fmt="flax" (default): `state`/`opt_state` pytrees serialized with flax
    msgpack inside a small pickle envelope (structure template is rebuilt at
    load time from a freshly-initialized state, like flax convention).
    fmt="orbax": the whole payload saved as one Orbax checkpoint directory
    at `filename`; sharded jax.Array leaves are written shard-wise.
    Rotation/best semantics are identical either way.
    """
    filename = os.path.abspath(filename)
    os.makedirs(os.path.dirname(filename), exist_ok=True)
    if fmt == "orbax":
        _remove_ckpt(filename)  # orbax refuses to overwrite; preempt re-saves
        ck = _std_checkpointer()
        ck.save(filename, dict(payload))
        ck.wait_until_finished()
    elif fmt == "flax":
        blob = {}
        for k, v in payload.items():
            if k in ("state", "opt_state"):
                blob[k] = serialization.to_bytes(_to_numpy(v))
            else:
                blob[k] = v
        with open(filename, "wb") as f:
            pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
    else:
        raise ValueError(f"unknown checkpoint fmt '{fmt}' (flax|orbax)")

    epoch = payload.get("epoch", 0)
    stem = _epoch_stem(filename)
    if not keep_all and stem is not None:
        _remove_ckpt(stem % (epoch - gap))

    if is_best:
        d = os.path.dirname(filename)
        ext = os.path.splitext(filename)[1]
        past_best = sorted(
            glob.glob(os.path.join(d, "model_best_*" + ext)),
            key=lambda x: int("".join(filter(str.isdigit, os.path.basename(x)))))
        if len(past_best) >= 5:
            _remove_ckpt(past_best[0])
        best_name = os.path.join(d, "model_best_epoch%d%s" % (epoch, ext))
        if fmt == "orbax":
            _remove_ckpt(best_name)
            _copy_ckpt(filename, best_name)
        else:
            with open(best_name, "wb") as f:
                pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def _epoch_stem(filename: str) -> Optional[str]:
    m = re.match(r"(.*epoch)(\d+)(\..*)$", filename)
    if not m:
        return None
    return m.group(1) + "%d" + m.group(3)


def _abstract_from_template(t):
    """Template leaf -> restore spec. jax.Array leaves keep their sharding,
    so an orbax resume lands directly on the current mesh (which may differ
    from the save-time mesh — orbax reshards on read)."""
    if hasattr(t, "shape") and hasattr(t, "dtype"):
        sharding = t.sharding if isinstance(t, jax.Array) else None
        return jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=sharding)
    return t


def _abstract_from_metadata(m):
    if type(m).__name__ == "ScalarMetadata":
        return 0.0 if "float" in str(m.dtype) else 0
    if hasattr(m, "shape") and hasattr(m, "dtype"):
        return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype)
    return m


def _load_orbax(filename: str, state_template, opt_template) -> Dict[str, Any]:
    filename = os.path.abspath(filename)
    ck = _std_checkpointer()
    if state_template is None and opt_template is None:
        return dict(ck.restore(filename))  # raw: nested dicts/lists
    meta = ck.metadata(filename).item_metadata
    is_leaf = lambda x: not isinstance(x, (dict, list, tuple))
    abstract = {}
    for key, sub in meta.items():
        tpl = {"state": state_template, "opt_state": opt_template}.get(key)
        if tpl is not None:
            abstract[key] = jax.tree_util.tree_map(_abstract_from_template, tpl)
        else:
            abstract[key] = jax.tree_util.tree_map(
                _abstract_from_metadata, sub, is_leaf=is_leaf)
    return dict(ck.restore(filename, abstract))


def load_checkpoint(filename: str, state_template=None, opt_template=None
                    ) -> Dict[str, Any]:
    """Inverse of save_checkpoint, either format (auto-detected from the
    path: orbax checkpoints are directories). With templates, pytrees are
    restored to their original structure/dtypes/shardings; without, raw
    dicts are returned."""
    if is_orbax_checkpoint(filename):
        return _load_orbax(filename, state_template, opt_template)
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
