"""PyTorch `.pth.tar` checkpoint interop.

Maps the reference's state_dict key grammar onto our flax pytrees and back,
so released CoCLR checkpoints load here and our checkpoints export to the
reference format. Key grammar (from /root/reference):

  backbone (S3D):      Conv_1a.conv1.weight, Mixed_3b.branch1.0.conv.weight, ...
                       (duplicated under blockN.* because the reference
                       registers each module twice, s3dg.py:147-197)
  backbone (ResNet):   conv1.weight, layer2.0.downsample.0.weight, ...
  MoCo encoders:       encoder_{q,k}.0.<backbone>, encoder_{q,k}.2.{weight,bias}
                       (fs->fs 1x1x1 conv), encoder_{q,k}.4.{weight,bias}
                       (fs->dim 1x1x1 conv)   [model/pretrain.py:49-62]
  CoCLR sampler:       sampler.0/2/4.*        [model/pretrain.py:300-305]
  queues:              queue [dim,K], queue_ptr, queue_second [dim,K],
                       queue_vname [K], queue_label [K]
  classifier:          backbone.<backbone>, final_bn.*, final_fc.{0|1}.*
                       [model/classifier.py:31-45]

Layout conversions: torch conv3d [O,I,kt,kh,kw] <-> flax [kt,kh,kw,I,O];
torch linear / 1x1x1-conv head [O,I(,1,1,1)] <-> flax Dense [I,O].
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

from flax import traverse_util


# ---------------------------------------------------------------------------
# torch -> flax
# ---------------------------------------------------------------------------

def _map_module_path(parts):
    """Map a torch module path (list of segments, no leaf) to flax path."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p.startswith("branch") and nxt is not None and nxt.isdigit():
            # branch0.0 -> branch0 ; branchN.j -> branchN_j
            out.append("branch0" if p == "branch0" else f"{p}_{nxt}")
            i += 2
        elif p.startswith("layer") and nxt is not None and nxt.isdigit():
            out.append(f"{p}_{nxt}")
            i += 2
        elif p == "downsample" and nxt is not None and nxt.isdigit():
            out.append("downsample_conv" if nxt == "0" else "downsample_bn")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def _is_bn_path(path) -> bool:
    last = path[-1]
    return bool(re.fullmatch(r"bn\d?", last)) or last in ("downsample_bn", "final_bn")


def flax_from_torch_backbone(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert torch backbone state_dict (numpy values) to
    {'params': ..., 'batch_stats': ...} flax variables for our backbones."""
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0].startswith("block") and parts[0][5:].isdigit():
            continue  # duplicate registration path in reference S3D
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        path = tuple(_map_module_path(parts[:-1]))
        val = np.asarray(val)

        if leaf == "weight":
            if val.ndim == 5:  # conv3d
                params[path + ("kernel",)] = val.transpose(2, 3, 4, 1, 0)
            elif val.ndim == 2:  # dense (self-gating fc)
                params[path + ("kernel",)] = val.transpose(1, 0)
            elif val.ndim == 1:  # BN gamma
                params[path + ("scale",)] = val
            else:
                raise ValueError(f"unexpected weight shape {val.shape} at {key}")
        elif leaf == "bias":
            params[path + ("bias",)] = val
        elif leaf == "running_mean":
            stats[path + ("mean",)] = val
        elif leaf == "running_var":
            stats[path + ("var",)] = val
        else:
            raise ValueError(f"unexpected leaf {leaf!r} at {key}")

    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }


def flax_from_torch_proj_encoder(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Convert one `encoder_q.` / `encoder_k.` / `sampler.` subtree into our
    ProjectionEncoder variables: {backbone: ..., fc1: ..., fc2: ...}."""
    backbone_sd = {}
    head = {}
    plen = len(prefix)
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        sub = key[plen:]
        if sub.startswith("0."):
            backbone_sd[sub[2:]] = val
        elif sub.startswith(("2.", "4.")):
            idx, leaf = sub.split(".", 1)
            name = "fc1" if idx == "2" else "fc2"
            val = np.asarray(val)
            if leaf == "weight":  # [O,I,1,1,1] -> [I,O]
                head[(name, "kernel")] = val.reshape(val.shape[0], val.shape[1]).T
            else:
                head[(name, "bias")] = val
    bb = flax_from_torch_backbone(backbone_sd)
    params = {"backbone": bb["params"]}
    params.update(traverse_util.unflatten_dict(head))
    return {"params": params, "batch_stats": {"backbone": bb["batch_stats"]}}


def flax_from_torch_classifier(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert a LinearClassifier state_dict (model/classifier.py) to our
    classifier variables: {backbone, final_bn?, final_fc}."""
    backbone_sd = {}
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, val in sd.items():
        val = np.asarray(val)
        if key.startswith("backbone."):
            backbone_sd[key[len("backbone."):]] = val
        elif key.startswith("final_bn."):
            leaf = key.split(".")[-1]
            if leaf == "weight":
                params[("final_bn", "scale")] = val
            elif leaf == "bias":
                params[("final_bn", "bias")] = val
            elif leaf == "running_mean":
                stats[("final_bn", "mean")] = val
            elif leaf == "running_var":
                stats[("final_bn", "var")] = val
        elif key.startswith("final_fc."):
            leaf = key.split(".")[-1]
            if leaf == "weight":
                params[("final_fc", "kernel")] = val.T
            elif leaf == "bias":
                params[("final_fc", "bias")] = val
    bb = flax_from_torch_backbone(backbone_sd)
    out_params = {"backbone": bb["params"]}
    out_params.update(traverse_util.unflatten_dict(params))
    out_stats = {"backbone": bb["batch_stats"]}
    out_stats.update(traverse_util.unflatten_dict(stats))
    return {"params": out_params, "batch_stats": out_stats}


# ---------------------------------------------------------------------------
# flax -> torch
# ---------------------------------------------------------------------------

_S3D_BLOCK_ALIASES = {
    # attribute name -> (blockN, index) duplicate registration (s3dg.py:147-197)
    "Conv_1a": ("block1", 0),
    "Conv_2b": ("block2", 1),
    "Conv_2c": ("block2", 2),
    "Mixed_3b": ("block3", 1),
    "Mixed_3c": ("block3", 2),
    "Mixed_4b": ("block4", 1),
    "Mixed_4c": ("block4", 2),
    "Mixed_4d": ("block4", 3),
    "Mixed_4e": ("block4", 4),
    "Mixed_4f": ("block4", 5),
    "Mixed_5b": ("block5", 1),
    "Mixed_5c": ("block5", 2),
}


def _unmap_module_path(path):
    """flax module path -> torch module path segments."""
    out = []
    for p in path:
        m = re.fullmatch(r"(branch\d)_(\d)", p)
        if p == "branch0":
            out += ["branch0", "0"]
        elif m:
            out += [m.group(1), m.group(2)]
        elif re.fullmatch(r"layer\d_\d+", p):
            l, b = p.rsplit("_", 1)
            out += [l, b]
        elif p == "downsample_conv":
            out += ["downsample", "0"]
        elif p == "downsample_bn":
            out += ["downsample", "1"]
        else:
            out.append(p)
    return out


def torch_from_flax_backbone(variables: Dict, duplicate_s3d_blocks: bool = True
                             ) -> Dict[str, np.ndarray]:
    """Inverse of flax_from_torch_backbone. Emits the duplicate `blockN.*`
    aliases for S3D so torch `load_state_dict(strict=True)` accepts it."""
    sd: Dict[str, np.ndarray] = {}

    def emit(key, val):
        sd[key] = val
        parts = key.split(".")
        if duplicate_s3d_blocks and parts[0] in _S3D_BLOCK_ALIASES:
            blk, idx = _S3D_BLOCK_ALIASES[parts[0]]
            sd[".".join([blk, str(idx)] + parts[1:])] = val

    flat_p = traverse_util.flatten_dict(variables["params"])
    flat_s = traverse_util.flatten_dict(variables.get("batch_stats", {}))

    for path, val in flat_p.items():
        val = np.asarray(val)
        tpath = _unmap_module_path(path[:-1])
        leaf = path[-1]
        base = ".".join(tpath)
        if leaf == "kernel":
            if val.ndim == 5:
                emit(base + ".weight", val.transpose(4, 3, 0, 1, 2))
            else:
                emit(base + ".weight", val.T)
        elif leaf == "scale":
            emit(base + ".weight", val)
        elif leaf == "bias":
            emit(base + ".bias", val)

    for path, val in flat_s.items():
        val = np.asarray(val)
        tpath = _unmap_module_path(path[:-1])
        base = ".".join(tpath)
        if path[-1] == "mean":
            emit(base + ".running_mean", val)
        elif path[-1] == "var":
            emit(base + ".running_var", val)
            emit(base + ".num_batches_tracked", np.asarray(0, dtype=np.int64))

    return sd


def torch_from_flax_proj_encoder(variables: Dict, prefix: str) -> Dict[str, np.ndarray]:
    """Inverse of flax_from_torch_proj_encoder for one encoder subtree."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    bb = torch_from_flax_backbone(
        {"params": params["backbone"], "batch_stats": stats.get("backbone", {})})
    sd = {f"{prefix}0.{k}": v for k, v in bb.items()}
    for name, idx in (("fc1", "2"), ("fc2", "4")):
        k = np.asarray(params[name]["kernel"])  # [I,O]
        b = np.asarray(params[name]["bias"])
        sd[f"{prefix}{idx}.weight"] = k.T[:, :, None, None, None]
        sd[f"{prefix}{idx}.bias"] = b
    return sd


def torch_from_moco_state(state, variant: str = "infonce"
                          ) -> Dict[str, np.ndarray]:
    """Full MoCo state -> reference state_dict (encoder_q/k[/sampler] +
    queue buffers, model/pretrain.py key grammar). queue layouts transpose
    [K,dim] <-> [dim,K]."""
    sd = {}
    sd.update(torch_from_flax_proj_encoder(
        {"params": state.params_q, "batch_stats": state.stats_q}, "encoder_q."))
    sd.update(torch_from_flax_proj_encoder(
        {"params": state.params_k, "batch_stats": state.stats_k}, "encoder_k."))
    sd["queue"] = np.asarray(state.queue).T.astype(np.float32)
    sd["queue_ptr"] = np.asarray([int(state.queue_ptr)], dtype=np.int64)
    if variant in ("ubernce", "coclr") and state.queue_label is not None:
        sd["queue_label"] = np.asarray(state.queue_label, dtype=np.int64)
    if variant == "coclr":
        sd.update(torch_from_flax_proj_encoder(
            {"params": state.params_s, "batch_stats": state.stats_s},
            "sampler."))
        sd["queue_second"] = np.asarray(state.queue_second).T.astype(np.float32)
        sd["queue_vname"] = np.asarray(state.queue_vname, dtype=np.int64)
    return sd


def moco_state_from_torch(sd: Dict[str, np.ndarray], state_template,
                          variant: str = "infonce"):
    """Reference state_dict -> MoCoState (inverse of torch_from_moco_state).
    Lets released CoCLR .pth.tar checkpoints run in this stack
    (checkpoint-level fidelity, SURVEY.md §5.4/§7)."""
    import jax.numpy as jnp

    q = flax_from_torch_proj_encoder(sd, "encoder_q.")
    k = flax_from_torch_proj_encoder(sd, "encoder_k.")
    upd = dict(params_q=q["params"], stats_q=q["batch_stats"],
               params_k=k["params"], stats_k=k["batch_stats"])
    if "queue" in sd:
        upd["queue"] = jnp.asarray(np.asarray(sd["queue"]).T)
    if "queue_ptr" in sd:
        upd["queue_ptr"] = jnp.asarray(
            int(np.asarray(sd["queue_ptr"]).reshape(-1)[0]), jnp.int32)
    if variant in ("ubernce", "coclr") and "queue_label" in sd:
        upd["queue_label"] = jnp.asarray(np.asarray(sd["queue_label"]),
                                         jnp.int32)
    if variant == "coclr":
        if any(key.startswith("sampler.") for key in sd):
            s = flax_from_torch_proj_encoder(sd, "sampler.")
            upd["params_s"] = s["params"]
            upd["stats_s"] = s["batch_stats"]
        if "queue_second" in sd:
            upd["queue_second"] = jnp.asarray(np.asarray(sd["queue_second"]).T)
        if "queue_vname" in sd:
            upd["queue_vname"] = jnp.asarray(np.asarray(sd["queue_vname"]),
                                             jnp.int32)
    return state_template.replace(**upd)


def load_torch_checkpoint(path: str) -> Dict:
    """Load a `.pth.tar` file into numpy (torch only needed here)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in ckpt.items():
        if k == "state_dict":
            out[k] = {sk: sv.detach().numpy() if hasattr(sv, "detach") else sv
                      for sk, sv in v.items()}
        elif k == "optimizer":
            continue  # torch Adam state is not transferable to optax layout
        else:
            out[k] = v
    return out


def save_torch_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                          epoch: int = 0, best_acc: float = 0.0,
                          iteration: int = 0) -> None:
    """Write a reference-format `.pth.tar` (main_nce.py:272-277 dict schema)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()}
    torch.save({"epoch": epoch, "state_dict": sd, "best_acc": best_acc,
                "optimizer": {}, "iteration": iteration}, path)
