"""Feature extraction + NN retrieval (eval/main_classifier.py:548-718).

TPU re-design: instead of batch=1 video-at-a-time inference (variable window
counts force a recompile or idle MXU), all (video, window) clip pairs are
flattened into one stream and processed in fixed-size batches; per-video
features are segment-means over the stream. Cache files keep the reference's
exact names/formats ({dataset}_{split}_{feature,label}.pth.tar via torch +
vname pkl) so merge_2stream and feature_linear_probe interop with reference
outputs.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np



def iter_flat_window_batches(dataset, clip_batch: int, num_workers: int = 8
                             ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (clips [clip_batch, T, S, S, 3], video_ids [clip_batch]).
    The final batch is padded with repeats (video_id = -1)."""
    from concurrent.futures import ThreadPoolExecutor

    buf_clips: List[np.ndarray] = []
    buf_vids: List[int] = []

    def flush(force=False):
        while len(buf_clips) >= clip_batch or (force and buf_clips):
            take = buf_clips[:clip_batch]
            vids = buf_vids[:clip_batch]
            del buf_clips[:clip_batch], buf_vids[:clip_batch]
            if len(take) < clip_batch:
                pad = clip_batch - len(take)
                take = take + [take[-1]] * pad
                vids = vids + [-1] * pad
            yield np.stack(take), np.asarray(vids, np.int64)

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        for sample in ex.map(dataset.__getitem__, range(len(dataset))):
            vid = int(sample["index"])
            for clip in sample["seq"]:
                buf_clips.append(clip)
                buf_vids.append(vid)
            yield from flush()
        yield from flush(force=True)


def extract_features(model, state, dataset, cfg, clip_batch: int = 32,
                     jitter_p: float = 0.3, seed: int = 0
                     ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Mean-pooled backbone features per video (mean over windows),
    eval/main_classifier.py:624-684. Returns (features [N, fs], labels [N],
    vnames [N]).

    jitter_p: the reference extracts features THROUGH a ColorJitter(0.2,...)
    @ p=0.3 consistent transform (main_classifier.py:560-563); default keeps
    that; pass 0 for clean features. The jitter runs in cfg.dtype (the
    compute-dtype policy shared with the pretrain aug path) via
    augment.eval_color_jitter — the round-2 f32 vmap/scan formulation cost
    as much as the S3D forward it fed (985 -> see BASELINE.md round 3)."""
    from coclr_tpu.ops.augment import eval_color_jitter, normalize
    from coclr_tpu.utils import pin_malloc_mmap_threshold

    pin_malloc_mmap_threshold()  # host-RSS creep fix (utils docstring)

    @jax.jit
    def feat_fn(state_, clips, key):
        x = clips.astype(cfg.dtype) / jnp.asarray(255.0, cfg.dtype)
        if jitter_p > 0:
            x = eval_color_jitter(x, key, p=jitter_p,
                                  strength=(0.2, 0.2, 0.2, 0.1))
        x = normalize(x, dtype=cfg.dtype)
        _, feat = model.apply(
            {"params": state_.params, "batch_stats": state_.batch_stats},
            x, train=False)
        return feat

    n = len(dataset)
    sums = None
    counts = np.zeros((n,), np.int64)
    rng = jax.random.PRNGKey(seed)
    for bi, (clips, vids) in enumerate(
            iter_flat_window_batches(dataset, clip_batch, cfg.workers)):
        feats = np.asarray(
            feat_fn(state, jnp.asarray(clips), jax.random.fold_in(rng, bi)),
            np.float32)
        if sums is None:
            sums = np.zeros((n, feats.shape[-1]), np.float32)
        for f, v in zip(feats, vids):
            if v >= 0:
                sums[v] += f
                counts[v] += 1
    features = sums / np.maximum(counts[:, None], 1)

    labels = np.zeros((n,), np.int64)
    vnames = []
    for i in range(n):
        row = dataset.video_subset.iloc[i]
        labels[i] = dataset.encode_action(row[2])
        vnames.append(row[3])
    return features, labels, vnames


def save_feature_cache(dirpath: str, dataset_name: str, split: str,
                       features, labels, vnames):
    """Reference cache format: torch .pth.tar tensors + vname pkl
    (eval/main_classifier.py:644-649)."""
    import torch

    os.makedirs(dirpath, exist_ok=True)
    torch.save(torch.from_numpy(np.ascontiguousarray(features)),
               os.path.join(dirpath, f"{dataset_name}_{split}_feature.pth.tar"))
    torch.save(torch.from_numpy(np.ascontiguousarray(labels)),
               os.path.join(dirpath, f"{dataset_name}_{split}_label.pth.tar"))
    with open(os.path.join(dirpath, f"{dataset_name}_{split}_vname.pkl"),
              "wb") as fp:
        pickle.dump([[v] for v in vnames], fp)


def load_feature_cache(dirpath: str, dataset_name: str, split: str):
    import torch

    f = torch.load(os.path.join(dirpath,
                                f"{dataset_name}_{split}_feature.pth.tar"),
                   map_location="cpu").numpy()
    l = torch.load(os.path.join(dirpath,
                                f"{dataset_name}_{split}_label.pth.tar"),
                   map_location="cpu").numpy()
    with open(os.path.join(dirpath, f"{dataset_name}_{split}_vname.pkl"),
              "rb") as fp:
        vnames = pickle.load(fp)
    return f, l, vnames


def center_normalize(x: np.ndarray) -> np.ndarray:
    """centering + L2 normalize (eval/main_classifier.py:690-695)."""
    x = x - x.mean(axis=0, keepdims=True)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def nn_retrieval(test_feature, test_label, train_feature, train_label,
                 ks=(1, 5, 10, 20, 50)) -> Dict[int, float]:
    """recall@k over cosine sim (eval/main_classifier.py:686-712)."""
    tf = center_normalize(np.asarray(test_feature, np.float32))
    rf = center_normalize(np.asarray(train_feature, np.float32))
    sim = tf @ rf.T
    out = {}
    maxk = min(max(ks), sim.shape[1])
    top = np.argsort(-sim, axis=1)[:, :maxk]
    hits = np.asarray(train_label)[top] == np.asarray(test_label)[:, None]
    for k in ks:
        kk = min(k, maxk)
        out[k] = float(np.any(hits[:, :kk], axis=1).mean())
    return out


def run_retrieval(model, state, cfg, train_dataset, test_dataset,
                  cache_dir: str, clip_batch: int = 32):
    """Full retrieval pass with feature caching (reference control flow:
    reuse cache when present)."""
    name = cfg.dataset
    results = {}
    feats = {}
    for split, ds in (("test", test_dataset), ("train", train_dataset)):
        fpath = os.path.join(cache_dir, f"{name}_{split}_feature.pth.tar")
        if os.path.exists(fpath):
            f, l, v = load_feature_cache(cache_dir, name, split)
        else:
            f, l, v = extract_features(model, state, ds, cfg, clip_batch)
            save_feature_cache(cache_dir, name, split, f, l, v)
        feats[split] = (f, l, v)
    results = nn_retrieval(feats["test"][0], feats["test"][1],
                           feats["train"][0], feats["train"][1])
    for k, acc in results.items():
        print("%dNN acc = %.4f" % (k, acc))
    return results
