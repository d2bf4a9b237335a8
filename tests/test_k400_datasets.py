"""K400-style dataset constructors over synthetic data."""

import numpy as np
import pytest

from coclr_tpu.data.datasets import (K400_LMDB_2CLIP,
                                     K400_2STREAM_LMDB_2CLIP)
from coclr_tpu.data.synthetic import make_synthetic_k400


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_k400")
    return make_synthetic_k400(str(root), n_classes=2, n_videos=4,
                               n_frames=24, size=(48, 64), flow=True)


def test_k400_2clip(synth):
    ds = K400_LMDB_2CLIP(root=synth["root"], db_path=synth["db_path_train"],
                         mode="train", num_frames=8, ds=1, return_label=True,
                         img_dim=32)
    assert len(ds) == 6  # 2 classes x 3 train videos
    s = ds[0]
    assert s["seq"].shape == (2, 8, 32, 32, 3)
    assert 0 <= int(s["label"]) < 2


def test_k400_2stream(synth):
    ds = K400_2STREAM_LMDB_2CLIP(
        root=synth["root"], db_path_rgb=synth["db_path_train"],
        db_path_flow=synth["db_path_flow_train"], mode="train", num_frames=8,
        return_label=True, return_source=True, img_dim=32)
    s = ds[0]
    assert s["seq_rgb"].shape == (2, 8, 32, 32, 3)
    assert s["seq_flow"].shape == (2, 8, 32, 32, 3)
    assert int(s["vname"]) >= 0


def test_k400_strict_short_filter(synth):
    # strict rule: vlen - T*ds - 1 > 0 (lmdb_dataset.py:594)
    ds = K400_LMDB_2CLIP(root=synth["root"], db_path=synth["db_path_train"],
                         mode="train", num_frames=24, ds=1,
                         return_label=True, img_dim=32)
    # videos have 24..31 frames; those with <= 25 are dropped
    for i in range(len(ds)):
        assert int(ds.video_subset.iloc[i][1]) - 24 - 1 > 0


def test_k400_in_memory_builder_matches_frames_path(tmp_path):
    """The round-5 in-memory K400 builder (direct-to-LMDB, cycled unique
    frames) must produce a dataset the K400 classes read identically to
    the frames-dir path: same split join, same per-video frame counts,
    decodable JPEGs, and the flow db's vlen (nf-1) driving the merge."""
    from coclr_tpu.data.datasets import K400_LMDB_2CLIP, K400_Flow_LMDB_2CLIP
    from coclr_tpu.data.synthetic import make_synthetic_k400

    out = make_synthetic_k400(str(tmp_path / "m"), n_classes=2, n_videos=3,
                              n_frames=16, size=(48, 64), flow=True, seed=1,
                              in_memory=True, frames_unique=4,
                              splits=("train",))
    ds = K400_LMDB_2CLIP(db_path=out["db_path_train"], root=out["root"],
                         mode="train", num_frames=4, ds=1, img_dim=32,
                         seed=0)
    assert len(ds) == 4  # 2 classes x (3-1) train videos
    sample = ds[0]
    assert sample["seq"].shape[0] == 2  # two clips
    from coclr_tpu.data.datasets import K400_2STREAM_LMDB_2CLIP

    dsf = K400_2STREAM_LMDB_2CLIP(
        db_path_rgb=out["db_path_train"],
        db_path_flow=out["db_path_flow_train"],
        root=out["root"], mode="train", num_frames=4, ds=1, img_dim=32,
        seed=0)
    assert len(dsf) == 4
    s2 = dsf[1]
    assert s2["seq_rgb"].shape[0] == 2 and s2["seq_flow"].shape[0] == 2
