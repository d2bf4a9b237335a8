"""center / five / ten-crop TTA testing (eval/main_classifier.py:425-545).

For each (crop position, flip) config, every temporal window of every test
video is classified; per-video softmax means are accumulated and summarized
at the center / five / ten checkpoints; prob json dumped in the reference's
`{ckpt}-prob-{title}.json` format for merge_2stream_prob.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from coclr_tpu.data import hostaug
from coclr_tpu.evalsuite.retrieval import iter_flat_window_batches
from coclr_tpu.evalsuite.steps import preprocess_eval
from coclr_tpu.utils.meters import AverageMeter


class NCropPolicy(hostaug.EvalClipPolicy):
    """FiveCrop(224) at `where` + flip + Scale(img_dim) + ColorJitter(0.2,
    p=0.3 consistent) — the host part is crop+flip; jitter runs on device."""

    def __init__(self, img_dim: int, where: int, flip: bool):
        super().__init__(img_dim=img_dim, mode="test", crop_where=where)
        self.flip = flip

    def post(self, clip):
        if self.flip:
            clip = np.ascontiguousarray(clip[:, :, ::-1, :])
        return clip


def run_ncrop_test(model, state, cfg, make_dataset, out_dir: str,
                   ckpt_name: str, clip_batch: int = 32, seed: int = 0):
    """make_dataset(policy) -> test-mode dataset (window sampler).
    cfg.center_crop / five_crop / ten_crop choose the config set
    (main_classifier.py:429-441)."""
    if cfg.center_crop:
        aug_list, flip_list, title = [5], [0], "center"
    elif cfg.five_crop:
        aug_list, flip_list, title = [5, 1, 2, 3, 4], [0], "five"
    else:
        aug_list, flip_list, title = [5, 1, 2, 3, 4], [0, 1], "ten"

    from coclr_tpu.ops.augment import _color_jitter, normalize
    from coclr_tpu.utils import pin_malloc_mmap_threshold

    pin_malloc_mmap_threshold()  # host-RSS creep fix (utils docstring)

    @jax.jit
    def prob_fn(state_, clips, key):
        x = clips.astype(jnp.float32) / 255.0

        def per_clip(c, k):
            apply = jax.random.uniform(jax.random.fold_in(k, 0)) < 0.3
            return _color_jitter(c, k, apply, strength=(0.2, 0.2, 0.2, 0.1))

        keys = jax.random.split(key, x.shape[0])
        x = jax.vmap(per_clip)(x, keys)
        x = normalize(x, dtype=cfg.dtype)
        logits, _ = model.apply(
            {"params": state_.params, "batch_stats": state_.batch_stats},
            x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    prob_dict: Dict[str, list] = {}
    rng = jax.random.PRNGKey(seed)
    results = {}

    for flip_idx in flip_list:
        for aug_idx in aug_list:
            print(f"Aug type: {aug_idx}; flip: {flip_idx}")
            policy = NCropPolicy(cfg.img_dim, aug_idx, bool(flip_idx))
            dataset = make_dataset(policy)
            # per-(video, config) mean over windows
            sums: Dict[int, np.ndarray] = {}
            counts: Dict[int, int] = {}
            for bi, (clips, vids) in enumerate(
                    iter_flat_window_batches(dataset, clip_batch,
                                             cfg.workers)):
                probs = np.asarray(
                    prob_fn(state, jnp.asarray(clips),
                            jax.random.fold_in(rng, bi)), np.float32)
                for p, v in zip(probs, vids):
                    if v < 0:
                        continue
                    sums[v] = sums.get(v, 0) + p
                    counts[v] = counts.get(v, 0) + 1
            for v, s in sums.items():
                vname = dataset.video_subset.iloc[int(v)][3]
                prob_dict.setdefault(vname, []).append(s / counts[v])

            if title == "ten" and flip_idx == 0 and aug_idx == 5:
                results["center"] = summarize_probability(
                    prob_dict, dataset.encode_action, "center", out_dir,
                    ckpt_name)
        if title == "ten" and flip_idx == 0:
            results["five"] = summarize_probability(
                prob_dict, dataset.encode_action, "five", out_dir, ckpt_name)

    results[title] = summarize_probability(prob_dict, dataset.encode_action,
                                           title, out_dir, ckpt_name)
    return results


def summarize_probability(prob_dict, action_to_idx, title: str,
                          out_dir: str, ckpt_name: str):
    """Per-video mean prob -> top1/top5 + prob json
    (eval/main_classifier.py:524-545)."""
    acc = [AverageMeter(), AverageMeter()]
    stat = {}
    for vname, probs in prob_dict.items():
        # vname 'Class/video' -> [-3] IndexErrors -> [-2] == 'Class'
        # (the reference's try/except, main_classifier.py:529-532)
        try:
            action_name = vname.split("/")[-3]
        except IndexError:
            action_name = vname.split("/")[-2]
        target = action_to_idx(action_name)
        mean_prob = np.mean(np.stack(probs, 0), axis=0)
        top = np.argsort(-mean_prob)
        acc[0].update(float(top[0] == target), 1)
        acc[1].update(float(target in top[:5]), 1)
        stat[vname] = {"mean_prob": mean_prob.tolist()}
    print("Mean: Acc@1: {0:.4f} Acc@5: {1:.4f}".format(acc[0].avg, acc[1].avg))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{ckpt_name}-prob-{title}.json"),
              "w") as fp:
        json.dump(stat, fp)
    return acc[0].avg, acc[1].avg
