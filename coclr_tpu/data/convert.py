"""Frames-directory -> LMDB converter.

Behavioral parity with /root/reference/dataset/convert_video_to_lmdb.py:46-87:
  - videos are `<dataset_path>/<action>/<video>/ *.jpg`
  - video ids are assigned by a seed-0 `random.shuffle` over the sorted
    `action/video` list, then written under `b'%09d'` keys (values =
    msgpack list of raw JPEG byte strings)
  - metadata records: `__keys__` (id keys in action order), `__len__`,
    `__order__` (the shuffled name list), `__vlen__` (frame counts in
    `__keys__`... sorted-key order, matching the reference's reader which
    re-sorts by key: lmdb_dataset.py:256-258)
  - a `<filename>-order` sidecar text file with the shuffled list

Implementation difference: single streaming pass with a thread pool for file
reads (the reference uses joblib n_jobs=64 per action); keys are written in
sorted order as our bulk writer requires.
"""

from __future__ import annotations

import glob
import os
import random
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

from coclr_tpu.data.lmdb_format import LMDBWriter
from coclr_tpu.data.pack import packb


def _read_video_frames(video_path: str) -> List[bytes]:
    filelist = sorted(glob.glob(os.path.join(video_path, "*.jpg")))
    out = []
    for p in filelist:
        with open(p, "rb") as f:
            out.append(f.read())
    return out


def _write_lmdb(names_action_major: List[str], get_frames, filename: str,
                psize: int = 4096, map_fn=map) -> str:
    """Shared LMDB emit: seed-0 shuffled id assignment + metadata records
    (convert_video_to_lmdb.py:56-87). `names_action_major` is the
    '<action>/<video>' list in action-major order; `get_frames(name)`
    returns that video's JPEG byte list (`map_fn` lets the directory
    reader prefetch with a thread pool)."""
    random.seed(0)
    video_list = sorted(names_action_major)
    random.shuffle(video_list)
    with open(filename + "-order", "w") as f:
        f.write("\n".join(video_list))
    get_video_id = dict(zip(video_list, range(len(video_list))))

    key_of = {n: ("%09d" % get_video_id[n]).encode("ascii")
              for n in names_action_major}
    global_key_list = [key_of[n] for n in names_action_major]
    vlen_by_name = {}

    # our writer needs sorted key order
    by_key = sorted(names_action_major, key=lambda n: key_of[n])
    writer = LMDBWriter(filename, psize=psize)
    for name, frames in zip(by_key, map_fn(get_frames, by_key)):
        vlen_by_name[name] = len(frames)
        writer.add(key_of[name], packb(frames))

    video_len_list = [vlen_by_name[n] for n in names_action_major]
    # metadata keys all start with '_' (0x5f) > '9', so they sort after ids
    writer.add(b"__keys__", packb(global_key_list))
    writer.add(b"__len__", packb(len(global_key_list)))
    writer.add(b"__order__", packb(video_list))
    writer.add(b"__vlen__", packb(video_len_list))
    return writer.close()


def make_dataset_lmdb(dataset_path: str, filename: str,
                      workers: int = 16, psize: int = 4096) -> str:
    """Build `<filename>` LMDB from `<dataset_path>/<action>/<video>/*.jpg`."""
    # action-major processing order for __keys__/__vlen__
    # (convert_video_to_lmdb.py:65-77)
    action_list = sorted(glob.glob(os.path.join(dataset_path, "*")))
    ordered_names: List[str] = []
    for ap in action_list:
        action_name = os.path.basename(ap)
        for vp in sorted(glob.glob(os.path.join(ap, "*"))):
            ordered_names.append(os.path.join(action_name, os.path.basename(vp)))

    # read with a thread pool, videos prefetched in write order
    with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
        return _write_lmdb(
            ordered_names,
            lambda n: _read_video_frames(os.path.join(dataset_path, n)),
            filename, psize=psize, map_fn=ex.map)


def make_dataset_lmdb_from_videos(videos, filename: str,
                                  psize: int = 4096) -> str:
    """Build `<filename>` LMDB directly from in-memory JPEG byte lists:
    `videos` maps '<action>/<video>' -> [jpeg bytes, ...].

    Same id assignment/metadata as make_dataset_lmdb, skipping the
    frames-directory round-trip — at full UCF101 cardinality (13k videos,
    1.25M frames) the intermediate tiny-file tree would double disk use
    and dominate build time on this box."""
    ordered = sorted(videos)  # action-major == sorted for 'action/video'
    return _write_lmdb(ordered, lambda n: videos[n], filename, psize=psize)
