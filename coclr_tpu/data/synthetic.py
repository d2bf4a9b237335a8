"""Synthetic UCF-style dataset generator for tests and benchmarks.

Produces the full reference on-disk contract: frames dirs of JPEGs, LMDBs via
our converter, ClassInd.txt, train/test split CSVs (path ends with '/', col2 =
class via split('/')[-3]) and video_source.json sibling groups — so every
dataset class and eval path can run hermetically.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import cv2
import numpy as np

from coclr_tpu.data.convert import make_dataset_lmdb


def _write_video_frames(path: str, n_frames: int, size: Tuple[int, int],
                        rng: np.random.RandomState):
    os.makedirs(path, exist_ok=True)
    h, w = size
    base = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
    for i in range(n_frames):
        img = np.clip(base.astype(np.int16) + rng.randint(-20, 20), 0, 255)
        ok, enc = cv2.imencode(".jpg", img.astype(np.uint8))
        assert ok
        with open(os.path.join(path, "image_%05d.jpg" % (i + 1)), "wb") as f:
            f.write(enc.tobytes())


def make_synthetic_ucf(root: str, n_classes: int = 2, n_groups: int = 2,
                       n_clips: int = 2, n_frames: int = 24,
                       size: Tuple[int, int] = (64, 80), flow: bool = True,
                       seed: int = 0):
    """Build a tiny UCF101-shaped dataset under `root`.

    Returns dict with paths: root (metadata dir), db_path, db_path_flow.
    """
    rng = np.random.RandomState(seed)
    meta_dir = os.path.join(root, "meta")
    frames_dir = os.path.join(root, "frame")
    flow_dir = os.path.join(root, "flow")
    os.makedirs(meta_dir, exist_ok=True)

    classes = ["Class%02d" % i for i in range(n_classes)]
    rows = []
    source_map = {}
    source_id = 0
    for cname in classes:
        for g in range(1, n_groups + 1):
            stem = "v_%s_g%02d" % (cname, g)
            source_map[stem] = source_id
            source_id += 1
            for c in range(1, n_clips + 1):
                vid = "%s_c%02d" % (stem, c)
                nf = n_frames + rng.randint(0, 8)
                _write_video_frames(os.path.join(frames_dir, cname, vid),
                                    nf, size, rng)
                if flow:
                    _write_video_frames(os.path.join(flow_dir, cname, vid),
                                        max(1, nf - 1), size, rng)
                rows.append(("/synth/frame/%s/%s/" % (cname, vid), nf, g))

    with open(os.path.join(meta_dir, "ClassInd.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")
    with open(os.path.join(meta_dir, "video_source.json"), "w") as f:
        json.dump(source_map, f)

    # groups 1..n-1 -> train, last group -> test (UCF-style split files)
    train = [r for r in rows if r[2] < n_groups or n_groups == 1]
    test = [r for r in rows if r[2] == n_groups]
    for name, subset in (("train", train), ("test", test or train)):
        with open(os.path.join(meta_dir, "%s_split01.csv" % name), "w") as f:
            for path, nf, _ in subset:
                f.write("%s,%d\n" % (path, nf))

    db_path = os.path.join(root, "ucf101_frame.lmdb")
    make_dataset_lmdb(frames_dir, db_path, workers=4)
    db_path_flow = None
    if flow:
        db_path_flow = os.path.join(root, "ucf101_tvl1_frame.lmdb")
        make_dataset_lmdb(flow_dir, db_path_flow, workers=4)

    return {"root": meta_dir, "db_path": db_path, "db_path_flow": db_path_flow}


def make_synthetic_k400(root: str, n_classes: int = 2, n_videos: int = 4,
                        n_frames: int = 24, size: Tuple[int, int] = (64, 80),
                        flow: bool = False, seed: int = 0):
    """K400-shaped dataset: '<class>/<video>' CSV rows (no trailing slash),
    {train,val}_split.csv, video_source.json keyed by vname
    (lmdb_dataset.py:569-575,823)."""
    rng = np.random.RandomState(seed)
    meta_dir = os.path.join(root, "meta")
    frames_dir = os.path.join(root, "frame")
    flow_dir = os.path.join(root, "flow")
    os.makedirs(meta_dir, exist_ok=True)

    classes = ["action%02d" % i for i in range(n_classes)]
    rows = []
    source_map = {}
    for ci, cname in enumerate(classes):
        for v in range(n_videos):
            vid = "vid_%s_%03d" % (cname, v)
            nf = n_frames + rng.randint(0, 8)
            _write_video_frames(os.path.join(frames_dir, cname, vid), nf,
                                size, rng)
            if flow:
                _write_video_frames(os.path.join(flow_dir, cname, vid),
                                    max(1, nf - 1), size, rng)
            rows.append(("%s/%s" % (cname, vid), nf, v))
            source_map["%s/%s" % (cname, vid)] = len(source_map)

    with open(os.path.join(meta_dir, "ClassInd.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")
    with open(os.path.join(meta_dir, "video_source.json"), "w") as f:
        json.dump(source_map, f)

    train = [r for r in rows if r[2] < max(1, n_videos - 1)]
    val = [r for r in rows if r[2] == n_videos - 1] or train
    for name, subset in (("train", train), ("val", val)):
        with open(os.path.join(meta_dir, "%s_split.csv" % name), "w") as f:
            for path, nf, _ in subset:
                f.write("/synth/k400/%s,%d\n" % (path, nf))

    out = {"root": meta_dir}
    for split, subset_dir in (("train", frames_dir), ("val", frames_dir)):
        db = os.path.join(root, "k400_frame_%s.lmdb" % split)
        make_dataset_lmdb(frames_dir, db, workers=4)
        out["db_path_%s" % split] = db
    if flow:
        for split in ("train", "val"):
            db = os.path.join(root, "k400_tvl1_frame_%s.lmdb" % split)
            make_dataset_lmdb(flow_dir, db, workers=4)
            out["db_path_flow_%s" % split] = db
    return out
