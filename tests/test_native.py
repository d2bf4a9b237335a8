"""C++ data plane vs pure-Python reference implementations."""

import numpy as np
import pytest

from coclr_tpu.data import native
from coclr_tpu.data.lmdb_format import LMDBReader, write_lmdb
from coclr_tpu.data.pack import packb, unpackb
from coclr_tpu.data.synthetic import make_synthetic_ucf

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_native")
    return make_synthetic_ucf(str(root), n_classes=1, n_groups=2, n_clips=1,
                              n_frames=12, size=(48, 64), flow=False)


def test_native_lmdb_get_matches_python(synth):
    ndb = native.NativeLMDB(synth["db_path"])
    with LMDBReader(synth["db_path"]) as pdb:
        assert len(ndb) == len(pdb)
        for key, val in pdb.items():
            assert ndb.get(key) == val
        assert ndb.get(b"zzz-missing") is None
    ndb.close()


def test_native_msgpack_frame_list(synth):
    ndb = native.NativeLMDB(synth["db_path"])
    with LMDBReader(synth["db_path"]) as pdb:
        keys = unpackb(pdb.get(b"__keys__"))
        frames_py = unpackb(pdb.get(keys[0]))
    fl = ndb.frame_list(keys[0])
    assert len(fl) == len(frames_py)
    for i in range(len(fl)):
        assert fl.jpeg_bytes(i) == frames_py[i]
    w, h = fl.dims(0)
    assert (w, h) == (64, 48)
    ndb.close()


def test_native_decode_crop_matches_cv2(synth):
    import cv2

    ndb = native.NativeLMDB(synth["db_path"])
    with LMDBReader(synth["db_path"]) as pdb:
        keys = unpackb(pdb.get(b"__keys__"))
    fl = ndb.frame_list(keys[0])
    rect = (5, 3, 40, 32)
    out = fl.decode_crop([0, 1, 2], rect, 32)
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8

    for i in range(3):
        raw = np.frombuffer(fl.jpeg_bytes(i), np.uint8)
        frame = cv2.imdecode(raw, cv2.IMREAD_COLOR)[:, :, ::-1]
        x, y, w, h = rect
        ref = cv2.resize(frame[y:y + h, x:x + w], (32, 32),
                         interpolation=cv2.INTER_CUBIC)
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        # both are a=-0.75 bicubic; cv2 uses fixed-point arithmetic and a
        # different JPEG IDCT path -> allow small per-pixel slack
        assert np.mean(diff) < 3.0, np.mean(diff)
        assert np.percentile(diff, 99) <= 12
    ndb.close()


def test_native_roundtrip_arbitrary_values(tmp_path):
    items = {b"a": b"x" * 10, b"big": b"y" * 50000,
             b"__keys__": packb([b"a", b"big"])}
    write_lmdb(str(tmp_path / "t.lmdb"), items.items())
    ndb = native.NativeLMDB(str(tmp_path / "t.lmdb"))
    for k, v in items.items():
        assert ndb.get(k) == v
    ndb.close()
