"""LMDB video datasets.

API parity with the reference's 10 exported classes
(/root/reference/dataset/lmdb_dataset.py:21-26), re-architected for the TPU
pipeline: __getitem__ returns numpy dicts of cropped uint8 clips + device-aug
flags (see coclr_tpu/data/hostaug.py for the host/device split). Metadata
handling, frame samplers, val subsampling, sibling-source ids and the
rgb/flow vlen merge are exact ports (file:line cites inline).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from coclr_tpu.data import hostaug, meta
from coclr_tpu.data.lmdb_format import LMDBReader
from coclr_tpu.data.pack import unpackb


def _default_root(style: str) -> str:
    """Split-metadata dir for a dataset style ('ucf101', 'hmdb51', ...).

    Default mirrors the reference's hard-coded relative layout
    (process_data/data/<style>, lmdb_dataset.py:84-90) — in this repo a
    symlink, which is GLOBAL state: two concurrent drives re-pointing it
    poison each other's splits (CLAUDE.md). COCLR_META_ROOT overrides the
    parent dir per-process (same <style> sublayout), so each drive can
    carry its own metadata root without touching the shared link."""
    env = os.environ.get("COCLR_META_ROOT")
    if env:
        return os.path.join(env, style)
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)),
                        "process_data", "data", style)


class _LMDBEnv:
    """One LMDB database + its metadata records. Uses the C++ data plane
    (zero-copy get + native msgpack/JPEG) when built, pure Python otherwise."""

    def __init__(self, db_path: str, need_vlen: bool):
        self.db = LMDBReader(db_path)
        self.length = unpackb(self.db.get(b"__len__"))
        self.keys = unpackb(self.db.get(b"__keys__"))
        self.order = unpackb(self.db.get(b"__order__"))
        self.vlen = unpackb(self.db.get(b"__vlen__")) if need_vlen else None
        # vname -> '%09d' id (lmdb_dataset.py:96-97)
        self.get_video_id = {
            o.decode(): "%09d" % i for i, o in enumerate(self.order)}
        from coclr_tpu.data import native as _native

        self.native = (_native.NativeLMDB(db_path)
                       if _native.available() else None)

    def raw_frames(self, vname: str):
        return unpackb(self.db.get(self.get_video_id[vname].encode("ascii")))

    def frames(self, vname: str):
        """Native frame list when available, else list of JPEG bytes."""
        key = self.get_video_id[vname].encode("ascii")
        if self.native is not None:
            fl = self.native.frame_list(key)
            if fl is not None:
                return fl
        return unpackb(self.db.get(key))


def _clip_dims(frames) -> tuple:
    """(w, h) of frame 0 without a full decode when native."""
    if hasattr(frames, "dims"):
        return frames.dims(0)
    f = hostaug.decode_jpeg(frames[0])
    return f.shape[1], f.shape[0]


def _decode_crop(frames, indices, rect, out_size: int) -> np.ndarray:
    """Fused decode+crop+resize. Returns uint8 [len(indices), out, out, 3].

    Preferred path: native zero-copy frame bytes (no msgpack python parse,
    no copies out of the LMDB mmap) + cv2 decode/resize — cv2 bundles a
    newer SIMD libjpeg-turbo than the system library the C++ plane links,
    measured ~15% faster per frame than the all-C++ path
    (COCLR_CPP_DECODE=1 forces the all-C++ decode instead).
    """
    if hasattr(frames, "decode_crop"):
        if not os.environ.get("COCLR_CPP_DECODE"):
            return np.stack([
                hostaug.crop_resize(hostaug.decode_jpeg(frames.raw(int(i))),
                                    rect, out_size) for i in indices])
        return frames.decode_crop(list(int(i) for i in indices), rect,
                                  out_size)
    decoded = [hostaug.decode_jpeg(frames[i]) for i in indices]
    return np.stack([hostaug.crop_resize(f, rect, out_size) for f in decoded])


class BaseVideoDataset:
    """Shared machinery: split table, samplers, decode."""

    def __init__(self, root: str, mode: str, num_frames: int, ds: int,
                 which_split: int, return_label: bool, return_source: bool,
                 style: str, seed: int = 0):
        self.root = root
        self.mode = mode
        self.num_frames = num_frames
        self.ds = ds
        self.which_split = which_split
        self.return_label = return_label
        self.return_source = return_source
        self.style = style
        self.seed = seed
        self.epoch = 0

        classes, self.class_to_idx, self.idx_to_class = meta.read_class_index(root)
        self.classes = classes
        self.num_class = len(classes)
        self.video_source = (meta.read_video_source(root)
                             if return_source else None)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _rng(self, index: int) -> np.random.RandomState:
        return np.random.RandomState(
            (self.seed * 1_000_003 + self.epoch * 10_007 + index) % (2 ** 31))

    def _source_id(self, vname: str) -> int:
        if self.style == "k400":
            return self.video_source[vname]  # lmdb_dataset.py:823
        # strip '_cXX' clip suffix (lmdb_dataset.py:154)
        return self.video_source[vname.split("/")[-1][0:-4]]

    def encode_action(self, name: str) -> int:
        return self.class_to_idx[name]

    def decode_action(self, idx: int) -> str:
        return self.idx_to_class[idx]

    def __len__(self):
        return len(self.video_subset)


class SingleStreamDataset(BaseVideoDataset):
    """One LMDB (RGB or flow-as-RGB-jpeg). two_clip=True for pretraining
    (UCF101LMDB_2CLIP & co), False for classification (UCF101LMDB & co)."""

    def __init__(self, root: Optional[str] = None, db_path: str = "",
                 mode: str = "val", num_frames: int = 32, ds: int = 1,
                 which_split: int = 1, window: bool = False,
                 return_label: bool = False, return_source: bool = False,
                 two_clip: bool = True, is_flow: bool = False,
                 style: str = "ucf101", img_dim: int = 128,
                 policy=None, seed: int = 0, max_windows: int = 0):
        root = root or _default_root(style)
        super().__init__(root, mode, num_frames, ds, which_split,
                         return_label, return_source,
                         "k400" if style == "k400" else "ucf", seed)
        self.window = window
        self.two_clip = two_clip
        self.is_flow = is_flow
        # max_windows > 0: decode only the CENTER max_windows eval windows
        # per video instead of all of them. DELIBERATE protocol knob, off by
        # default: the reference means features over every hop window
        # (eval/main_classifier.py:633-638); on a host-decode-bound box the
        # center window(s) halve feature-extraction cost at full
        # cardinality, and both sides of an init-vs-mined comparison use
        # the same setting so the comparison is unaffected.
        self.max_windows = max_windows
        self.img_dim = img_dim
        self.env = _LMDBEnv(db_path, need_vlen=is_flow)
        if two_clip:
            self.policy = policy or hostaug.PretrainClipPolicy(img_dim=img_dim)
        else:
            self.policy = policy or hostaug.EvalClipPolicy(img_dim=img_dim,
                                                           mode=mode)

        if style == "k400":
            split_mode = "val" if mode == "test" else mode
            video_info = meta.load_k400_split(root, split_mode, self.classes)
            strict = True
        else:
            video_info = meta.load_ucf_split(root, mode, which_split)
            strict = False

        if is_flow:
            # flow vlen differs from rgb; merge column 4
            video_info = meta.merge_flow_vlen(
                video_info, self.env.keys, self.env.vlen, self.env.order)
            vlen_col = 4
        else:
            vlen_col = 1
        self.vlen_col = vlen_col

        video_info = meta.drop_short_videos(video_info, vlen_col,
                                            num_frames, ds, strict)
        self.video_info = meta.val_subsample(video_info, mode)
        self.video_subset = self.video_info

    def _sample_indices(self, rng, vlen: int) -> np.ndarray:
        test_mode = (self.mode == "test") or self.window
        if self.two_clip:
            s1 = meta.frame_sampler(rng, vlen, self.num_frames, self.ds, False)
            s2 = meta.frame_sampler(rng, vlen, self.num_frames, self.ds, False)
            return np.stack([s1, s2])  # [2, T]
        out = meta.frame_sampler(rng, vlen, self.num_frames, self.ds, test_mode)
        return out if out.ndim == 2 else out[None, :]  # [n_windows, T]

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.video_subset.iloc[index]
        vlabel, vname = row[2], row[3]
        vlen = int(row[self.vlen_col])
        rng = self._rng(index)

        frames = self.env.frames(vname)
        w_img, h_img = _clip_dims(frames)
        out: Dict[str, np.ndarray] = {}

        if self.two_clip:
            windows_idx = self._sample_indices(rng, vlen)  # [2, T]
            win_choice, aug_base = self.policy.sample(rng)
            clips = []
            for ci in range(2):
                idxs = windows_idx[win_choice[ci]]
                rect = self.policy.sample_rect(rng, w_img, h_img)
                clips.append(self.policy.post(
                    _decode_crop(frames, idxs, rect, self.img_dim)))
            out["seq"] = np.stack(clips)  # [2, T, S, S, 3] uint8
            out["aug_base"] = np.asarray(aug_base, np.uint8)
        else:
            windows_idx = self._sample_indices(rng, vlen)  # [n, T]
            if 0 < self.max_windows < len(windows_idx):
                lo = (len(windows_idx) - self.max_windows) // 2
                windows_idx = windows_idx[lo:lo + self.max_windows]
            clips = []
            for idxs in windows_idx:
                rect = self.policy.sample_rect(rng, w_img, h_img)
                clips.append(self.policy.post(
                    _decode_crop(frames, idxs, rect, self.img_dim)))
            out["seq"] = np.stack(clips)  # [n_windows, T, S, S, 3]

        if self.return_label:
            out["label"] = np.int32(self.encode_action(vlabel))
        if self.return_source:
            out["vname"] = np.int32(self._source_id(vname))
        out["index"] = np.int32(index)
        return out


class TwoStreamDataset(BaseVideoDataset):
    """Dual LMDB (rgb + flow) 2-clip dataset for CoCLR
    (lmdb_dataset.py:372-529, 682-840). The same crop is applied to the RGB
    and flow frames of a clip (the reference achieves this by doubling
    seq_len: main_coclr.py:448, lmdb_dataset.py:503-504)."""

    def __init__(self, root: Optional[str] = None, db_path_rgb: str = "",
                 db_path_flow: str = "", mode: str = "val",
                 num_frames: int = 32, ds: int = 1, which_split: int = 1,
                 return_label: bool = False, return_source: bool = False,
                 style: str = "ucf101", img_dim: int = 128,
                 policy=None, seed: int = 0):
        root = root or _default_root(style)
        super().__init__(root, mode, num_frames, ds, which_split,
                         return_label, True,
                         "k400" if style == "k400" else "ucf", seed)
        self.img_dim = img_dim
        self.env_rgb = _LMDBEnv(db_path_rgb, need_vlen=False)
        self.env_flow = _LMDBEnv(db_path_flow, need_vlen=True)
        self.policy = policy or hostaug.PretrainClipPolicy(img_dim=img_dim)

        if style == "k400":
            split_mode = "val" if mode == "test" else mode
            video_info = meta.load_k400_split(root, split_mode, self.classes)
            # long path -> short path (lmdb_dataset.py:747-748)
            if len(video_info.iloc[0][3].split("/")) != 2:
                video_info[3] = (video_info[3].str.split("/")
                                 .str.slice(-2, None, 1).str.join("/"))
            strict = True
        else:
            video_info = meta.load_ucf_split(root, mode, which_split)
            strict = False

        rgb_names = [i.decode() for i in self.env_rgb.order]
        video_info = meta.merge_flow_vlen(
            video_info, self.env_flow.keys, self.env_flow.vlen,
            self.env_flow.order, restrict_to=rgb_names)
        # vlen = min(rgb, flow) (lmdb_dataset.py:440,751)
        video_info[4] = video_info[[1, 4]].min(axis=1)

        video_info = meta.drop_short_videos(video_info, 4, num_frames, ds,
                                            strict)
        self.video_info = meta.val_subsample(video_info, mode)
        self.video_subset = self.video_info

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        row = self.video_subset.iloc[index]
        vlabel, vname, vlen = row[2], row[3], int(row[4])
        rng = self._rng(index)

        frames_rgb = self.env_rgb.frames(vname)
        frames_flow = self.env_flow.frames(vname)
        w_img, h_img = _clip_dims(frames_rgb)

        s1 = meta.frame_sampler(rng, vlen, self.num_frames, self.ds, False)
        s2 = meta.frame_sampler(rng, vlen, self.num_frames, self.ds, False)
        windows_idx = np.stack([s1, s2])
        win_choice, aug_base = self.policy.sample(rng)

        clips_rgb, clips_flow = [], []
        for ci in range(2):
            idxs = windows_idx[win_choice[ci]]
            # one crop rect for the whole rgb+flow clip unit
            # (lmdb_dataset.py:503-504 via doubled seq_len)
            rect = self.policy.sample_rect(rng, w_img, h_img)
            clips_rgb.append(self.policy.post(
                _decode_crop(frames_rgb, idxs, rect, self.img_dim)))
            clips_flow.append(self.policy.post(
                _decode_crop(frames_flow, idxs, rect, self.img_dim)))

        out = {
            "seq_rgb": np.stack(clips_rgb),
            "seq_flow": np.stack(clips_flow),
            "aug_base": np.asarray(aug_base, np.uint8),
            "vname": np.int32(self._source_id(vname)),
            "index": np.int32(index),
        }
        if self.return_label:
            out["label"] = np.int32(self.encode_action(vlabel))
        return out


# ---------------------------------------------------------------------------
# Reference-named constructors (lmdb_dataset.py:21-26 export list)
# ---------------------------------------------------------------------------

def _db(data_root: str, rel: str) -> str:
    return os.path.join(data_root, rel)


def UCF101LMDB_2CLIP(data_root="", db_path=None, **kw):
    return SingleStreamDataset(
        db_path=db_path or _db(data_root, "UCF101/ucf101_frame.lmdb"),
        two_clip=True, style="ucf101", **kw)


def UCF101Flow_LMDB_2CLIP(data_root="", db_path=None, **kw):
    return SingleStreamDataset(
        db_path=db_path or _db(data_root, "UCF101/ucf101_tvl1_frame.lmdb"),
        two_clip=True, is_flow=True, style="ucf101", **kw)


def UCF101_2STREAM_LMDB_2CLIP(data_root="", db_path_rgb=None,
                              db_path_flow=None, **kw):
    return TwoStreamDataset(
        db_path_rgb=db_path_rgb or _db(data_root, "UCF101/ucf101_frame.lmdb"),
        db_path_flow=db_path_flow or _db(data_root,
                                         "UCF101/ucf101_tvl1_frame.lmdb"),
        style="ucf101", **kw)


def K400_LMDB_2CLIP(data_root="", db_path=None, mode="val", **kw):
    split_mode = "val" if mode == "test" else mode
    return SingleStreamDataset(
        db_path=db_path or _db(data_root,
                               f"k400/lmdb/k400_frame_{split_mode}.lmdb"),
        two_clip=True, style="k400", mode=mode, **kw)


def K400_Flow_LMDB_2CLIP(data_root="", db_path=None, mode="val", **kw):
    split_mode = "val" if mode == "test" else mode
    return SingleStreamDataset(
        db_path=db_path or _db(
            data_root, f"k400/lmdb/k400_tvl1_frame_{split_mode}.lmdb"),
        two_clip=True, is_flow=True, style="k400", mode=mode, **kw)


def K400_2STREAM_LMDB_2CLIP(data_root="", db_path_rgb=None,
                            db_path_flow=None, mode="val", **kw):
    split_mode = "val" if mode == "test" else mode
    return TwoStreamDataset(
        db_path_rgb=db_path_rgb or _db(
            data_root, f"k400/lmdb/k400_frame_{split_mode}.lmdb"),
        db_path_flow=db_path_flow or _db(
            data_root, f"k400/lmdb/k400_tvl1_frame_{split_mode}.lmdb"),
        style="k400", mode=mode, **kw)


def UCF101LMDB(data_root="", db_path=None, **kw):
    return SingleStreamDataset(
        db_path=db_path or _db(data_root, "UCF101/ucf101_frame.lmdb"),
        two_clip=False, style="ucf101", **kw)


def UCF101Flow_LMDB(data_root="", db_path=None, **kw):
    return SingleStreamDataset(
        db_path=db_path or _db(data_root, "UCF101/ucf101_tvl1_frame.lmdb"),
        two_clip=False, is_flow=True, style="ucf101", **kw)


def HMDB51LMDB(data_root="", db_path=None, **kw):
    return SingleStreamDataset(
        db_path=db_path or _db(data_root, "HMDB51/hmdb51_frame.lmdb"),
        two_clip=False, style="hmdb51", **kw)


def HMDB51Flow_LMDB(data_root="", db_path=None, **kw):
    return SingleStreamDataset(
        db_path=db_path or _db(data_root, "HMDB51/hmdb51_tvl1_frame.lmdb"),
        two_clip=False, is_flow=True, style="hmdb51", **kw)
