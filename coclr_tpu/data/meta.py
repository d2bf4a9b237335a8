"""Split metadata parsing — parity with the reference's pandas pipeline.

Schemas (/root/reference/process_data/data + dataset/lmdb_dataset.py):
  UCF/HMDB CSV rows: "<.../frame/Class/video_dir/>,num_frames" (path ends with
  '/': class = split('/')[-3], vname = class + '/' + split('/')[-2])
  K400 CSV rows:     "<.../Class/video_file>,num_frames" (class = [-2],
  vname = class + '/' + [-1])
  ClassInd.txt: one class per line (or "id,class")
  video_source.json: {video-stem -> source-group id} (sibling videos)
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


def read_class_index(root: str):
    with open(os.path.join(root, "ClassInd.txt")) as f:
        classes = [l.strip() for l in f.readlines() if l.strip()]
    if "," in classes[0]:
        classes = [c.split(",")[-1].strip() for c in classes]
    class_to_idx = {c: i for i, c in enumerate(classes)}
    idx_to_class = {i: c for i, c in enumerate(classes)}
    return classes, class_to_idx, idx_to_class


def read_video_source(root: str) -> Dict[str, int]:
    with open(os.path.join(root, "video_source.json")) as f:
        return json.load(f)


def load_ucf_split(root: str, mode: str, which_split: int) -> pd.DataFrame:
    """Columns 0..3 like lmdb_dataset.py:84-89: path, vlen, class, vname."""
    split_mode = "test" if mode == "val" else mode
    path = os.path.join(root, "%s_split%02d.csv" % (split_mode, which_split))
    video_info = pd.read_csv(path, header=None)
    video_info[2] = video_info[0].str.split("/").str.get(-3)
    video_info[3] = video_info[2] + "/" + video_info[0].str.split("/").str.get(-2)
    return video_info


def load_k400_split(root: str, split_mode: str, classes: List[str]) -> pd.DataFrame:
    """lmdb_dataset.py:569-572."""
    path = os.path.join(root, "%s_split.csv" % split_mode)
    video_info = pd.read_csv(path, header=None)
    video_info[2] = video_info[0].str.split("/").str.get(-2)
    video_info[3] = video_info[2] + "/" + video_info[0].str.split("/").str.get(-1)
    return video_info[video_info[2].isin(classes)]


def merge_flow_vlen(video_info: pd.DataFrame, db_keys: List[bytes],
                    vlen_list: List[int], db_order: List[bytes],
                    restrict_to: Optional[List[str]] = None) -> pd.DataFrame:
    """Attach flow frame counts as column 4 (lmdb_dataset.py:254-258,430-440):
    __vlen__ is aligned with sorted(__keys__), which is db_order order."""
    vname_list = [i.decode() for i in db_order]
    ordered = sorted(zip([i.decode() for i in db_keys], vlen_list),
                     key=lambda x: x[0])
    ordered = [v for _, v in ordered]
    df = pd.DataFrame(zip(vname_list, ordered), columns=[3, 4])
    if restrict_to is not None:
        df = df[df[3].isin(restrict_to)]
    return video_info.merge(df, left_on=3, right_on=3).dropna()


def drop_short_videos(video_info: pd.DataFrame, vlen_col: int,
                      num_frames: int, ds: int, strict: bool) -> pd.DataFrame:
    """lmdb_dataset.py:99-105 (pretrain/eval allow half-padding) vs :587-595
    (kinetics strict)."""
    if strict:
        keep = video_info[vlen_col] - num_frames * ds - 1 > 0
    else:
        keep = video_info[vlen_col] - num_frames // 2 * ds - 1 > 0
    return video_info[keep]


def val_subsample(video_info: pd.DataFrame, mode: str) -> pd.DataFrame:
    """val = 30% sample with seed 666 (lmdb_dataset.py:107-108)."""
    if mode == "val":
        return video_info.sample(frac=0.3, random_state=666)
    return video_info


def frame_sampler(rng: np.random.RandomState, total: int, num_frames: int,
                  ds: int, test_mode: bool) -> np.ndarray:
    """Exact port of the reference sampler (lmdb_dataset.py:111-132).

    train/val: one random window [num_frames] (left-padded with index 0 when
    the video is short). test: all half-overlapping windows
    [n_windows, num_frames] (hop = num_frames*ds//2 - 1).
    """
    if test_mode:
        if total - num_frames * ds <= 0:
            sequence = np.arange(num_frames) * ds
            seq_idx = np.zeros_like(sequence)
            sequence = sequence[sequence < total]
            seq_idx[-len(sequence):] = sequence
            return seq_idx[None, :]
        available = total - num_frames * ds
        start = np.expand_dims(
            np.arange(0, available + 1, num_frames * ds // 2 - 1), 1)
        seq_idx = np.expand_dims(np.arange(num_frames) * ds, 0) + start
        return seq_idx
    if total - num_frames * ds <= 0:
        sequence = np.arange(num_frames) * ds + rng.choice(range(ds), 1)
        seq_idx = np.zeros_like(sequence)
        sequence = sequence[sequence < total]
        seq_idx[-len(sequence):] = sequence
        return seq_idx
    start = rng.choice(range(total - num_frames * ds), 1)
    return np.arange(num_frames) * ds + start
