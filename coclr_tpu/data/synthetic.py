"""Synthetic UCF-style dataset generator for tests and benchmarks.

Produces the full reference on-disk contract: frames dirs of JPEGs, LMDBs via
our converter, ClassInd.txt, train/test split CSVs (path ends with '/', col2 =
class via split('/')[-3]) and video_source.json sibling groups — so every
dataset class and eval path can run hermetically.
"""

from __future__ import annotations

import json
import os
import time
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

    For n_classes > 8 a 1-D speed code cannot span the label space (101
    UCF-scale classes over the aliasing-safe omega range [0.25, 1.55]
    would sit 0.013 rad/frame apart — inside the instance jitter). The
    class code becomes 2-D: TWO superimposed gratings, mutually
    ORTHOGONAL in orientation and ~3x apart in wavelength, each carrying
    its own band-coded drift speed. class_id -> (i, j) on an
    (ceil(n/10) x 10) grid; grating A (fine wavelength) encodes i,
    grating B (coarse) encodes j. Orthogonality + the wavelength gap keep
    the components separable under the training crop (measured crop scale
    range 0.71-2.13x at 128 crops from 136x180 sources: apparent
    wavelengths stay in disjoint bands), and both speeds remain purely
    temporal codes with the same aug invariances as the 1-D design.

    The orientation nuisance changes form in the 2-D code: CONTINUOUS
    rotation adds a rotation-velocity term dk/dt . x to the local phase
    velocity — up to |k| * rot * |x| ~ several rad/frame across the frame,
    which buries a 0.118-rad/frame band spacing (measured: an FFT phase
    estimator that nails omega to +-0.01 on static orientation degrades to
    +-0.5 under rot=0.12; the 4-class code's 0.33 spacing tolerated it,
    101 bands cannot). Instead, orientation is PIECEWISE-CONSTANT with
    shot-cut jumps (~18-frame segments, both gratings jump together like a
    camera cut): clips of the same video still share no stable orientation
    (the anti-shortcut purpose of rotation), while within a segment the
    drift speed is exactly readable. Recoverability under crop+flip+JPEG
    is checked by tools/check_synth_code.py (FFT phase-velocity
    estimator).
    """
    h, w = size
    theta0 = rng.uniform(0, np.pi)
    rot = 0.12 * (1.0 if rng.rand() < 0.5 else -1.0)  # orientation rad/frame
    # tint/contrast are FIXED, not instance-random: any stable appearance
    # nuisance becomes an instance-discrimination shortcut that lets the
    # model skip learning the class-correlated speed code
    tint = np.asarray([0.8, 0.8, 0.8])
    # noise stays at RGB strength for flow too: a cleaner grating's
    # temporal mean is class-correlated (sinc(omega*T/2) attenuation) and
    # linearly exposed to random-init conv features — measured: 0.06 noise
    # put UNTRAINED flow retrieval at 0.44, erasing the learning signal
    noise = 0.10

    def band_omega(idx: int, n_bands: int) -> float:
        # class-banded drift speed (rad/frame), instance-jittered within
        # band; spacing stays below pi to avoid temporal aliasing at ds=1
        unit = (idx + 0.5 + 0.7 * rng.uniform(-0.5, 0.5)) / n_bands
        return 0.25 + 1.30 * unit

    if n_classes <= 8:
        # 1-D code (rounds 2-3 drives): one grating, speed = class,
        # orientation continuously rotating
        lam = 9.0 if modality == "rgb" else 14.0      # wavelength in px
        contrast = 0.45 if modality == "rgb" else 0.50
        gratings = [(lam, band_omega(class_id, n_classes), 0.0, contrast)]
        t_idx = np.arange(n_frames, dtype=np.float32)
        theta_t = (theta0 + rot * t_idx).astype(np.float32)
    else:
        n2 = 10
        i, j = class_id // n2, class_id % n2
        n1 = (n_classes + n2 - 1) // n2
        lams = (7.0, 21.0) if modality == "rgb" else (12.0, 30.0)
        c = 0.24 if modality == "rgb" else 0.26
        gratings = [(lams[0], band_omega(i, n1), 0.0, c),
                    (lams[1], band_omega(j, n2), np.pi / 2, c)]
        # shot-cut orientation: piecewise constant, ~18-frame segments
        theta_t = np.empty(n_frames, np.float32)
        pos = 0
        while pos < n_frames:
            seg = int(rng.randint(12, 25))
            theta_t[pos:pos + seg] = rng.uniform(0, np.pi)
            pos += seg

    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    if n_classes <= 8:
        # small-scale path (rounds 2-3 drives + tests): continuous rotation
        # forces per-frame spatial phase; keep the exact round-3 stream
        t = np.arange(n_frames, dtype=np.float32)[:, None, None]
        img = np.full((n_frames, h, w), 0.5, np.float32)
        for lam, omega, dtheta, contrast in gratings:
            sign = 1.0 if rng.rand() < 0.5 else -1.0
            phase = rng.uniform(0, 2 * np.pi)
            theta = (theta_t + dtheta)[:, None, None]
            u = np.cos(theta) * xx[None] + np.sin(theta) * yy[None]
            img += np.float32(contrast) * np.sin(
                np.float32(2 * np.pi / lam) * u
                + np.float32(phase) + np.float32(sign * omega) * t)
        vid = img[..., None] * tint[None, None, None, :].astype(np.float32)
        # strong per-frame noise: a nuisance (not a stable instance
        # identity). float32 end-to-end: the float64 noise + clip chain
        # dominated render time 10x at full-cardinality scale (13k videos);
        # the noise stream is a Generator draw seeded from `rng`
        # (deterministic given the caller's RandomState, values differ from
        # the pre-round-4 float64 stream)
        g = np.random.default_rng(rng.randint(0, 2 ** 31))
        vid += g.standard_normal(vid.shape,
                                 dtype=np.float32) * np.float32(noise)
        return (np.clip(vid, 0.0, 1.0) * np.float32(255.0)).astype(np.uint8)

    # Full-cardinality path: orientation is piecewise-constant, so the
    # spatial phase plane A = k.x + phase is fixed within a segment and
    # sin(A + omega*t) = sin(A)cos(omega*t) + cos(A)sin(omega*t) — per-frame
    # work collapses to two broadcast FMAs over [H, W] instead of a fresh
    # per-pixel sin. Measured 5.3 -> 0.6 ms/frame at 136x180 (the naive
    # render put the 101-class / ~13k-video build at ~4h on this 1-core
    # box; this + single-plane noise brings it under 1h). The fixed gray
    # tint makes all three channels identical pre-noise, and the noise is
    # a NUISANCE, not a per-channel code — so one luminance noise plane
    # (broadcast to RGB) replaces three independent draws; JPEG 4:2:0
    # chroma subsampling was averaging per-channel noise anyway.
    segs = []
    pos = 0
    while pos < n_frames:
        end = pos + 1
        while end < n_frames and theta_t[end] == theta_t[pos]:
            end += 1
        segs.append((pos, end, theta_t[pos]))
        pos = end
    img = np.full((n_frames, h, w), 0.5, np.float32)
    t_all = np.arange(n_frames, dtype=np.float32)
    for lam, omega, dtheta, contrast in gratings:
        sign = 1.0 if rng.rand() < 0.5 else -1.0
        phase = rng.uniform(0, 2 * np.pi)
        w_t = np.float32(sign * omega) * t_all
        cos_w = (np.float32(contrast) * np.cos(w_t)).astype(np.float32)
        sin_w = (np.float32(contrast) * np.sin(w_t)).astype(np.float32)
        for s, e, th in segs:
            u = (np.cos(th + dtheta) * xx + np.sin(th + dtheta) * yy)
            a = np.float32(2 * np.pi / lam) * u + np.float32(phase)
            sin_a, cos_a = np.sin(a), np.cos(a)
            img[s:e] += (cos_w[s:e, None, None] * sin_a[None]
                         + sin_w[s:e, None, None] * cos_a[None])
    img *= np.float32(tint[0])  # tint scales signal only, as in the 1-D path
    g = np.random.default_rng(rng.randint(0, 2 ** 31))
    img += g.standard_normal(img.shape, dtype=np.float32) * np.float32(noise)
    lum = (np.clip(img, 0.0, 1.0) * np.float32(255.0)).astype(np.uint8)
    return np.repeat(lum[..., None], 3, axis=-1)


def _write_frames_from_array(path: str, vid: np.ndarray):
    """Write [T, H, W, 3] RGB uint8 as the reference's image_%05d.jpg files."""
    os.makedirs(path, exist_ok=True)
    for i in range(vid.shape[0]):
        ok, enc = cv2.imencode(".jpg", vid[i][:, :, ::-1])  # RGB->BGR
        assert ok
        with open(os.path.join(path, "image_%05d.jpg" % (i + 1)), "wb") as f:
            f.write(enc.tobytes())


def _encode_frames(vid: np.ndarray):
    """[T, H, W, 3] RGB uint8 -> list of JPEG bytes (cv2, RGB->BGR)."""
    out = []
    for i in range(vid.shape[0]):
        ok, enc = cv2.imencode(".jpg", vid[i][:, :, ::-1])
        assert ok
        out.append(enc.tobytes())
    return out


def make_synthetic_ucf(root: str, n_classes: int = 2, n_groups: int = 2,
                       n_clips: int = 2, n_frames: int = 24,
                       size: Tuple[int, int] = (64, 80), flow: bool = True,
                       seed: int = 0, content: str = "noise",
                       test_groups: int = 1, in_memory: bool = False,
                       short_frac: float = 0.0, progress: bool = False):
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

    in_memory (learnable content only): skip the frames-directory round
    trip and write JPEG byte lists straight into the LMDB
    (convert.make_dataset_lmdb_from_videos) — at full UCF101 cardinality
    (101 classes, ~13k videos, ~1.25M frames) the tiny-file tree would
    double disk use and dominate build time.

    short_frac: fraction of TRAIN clips rendered with n_frames//3 frames,
    so the reference's drop-short filter
    (/root/reference/dataset/lmdb_dataset.py:84-108) actually filters rows
    at scale; shorts never land in the test split (keeps the retrieval
    query count exact). The short rows still appear in the split CSV with
    their true frame counts — dropping them is the loader's job.

    Returns dict with paths: root (metadata dir), db_path, db_path_flow.
    """
    rng = np.random.RandomState(seed)
    meta_dir = os.path.join(root, "meta")
    frames_dir = os.path.join(root, "frame")
    flow_dir = os.path.join(root, "flow")
    os.makedirs(meta_dir, exist_ok=True)
    if in_memory and content != "learnable":
        raise ValueError("in_memory requires content='learnable'")
    mem_rgb = {} if in_memory else None
    mem_flow = {} if in_memory else None
    # train/test cut known up front so short clips stay train-only
    cut = max(1, n_groups - max(1, test_groups) + 1)

    classes = ["Class%02d" % i for i in range(n_classes)]
    rows = []
    source_map = {}
    source_id = 0
    t_start = time.time()
    for ci, cname in enumerate(classes):
        if progress and ci % 5 == 0:
            print(f"[synth] class {ci}/{n_classes} "
                  f"({time.time() - t_start:.0f}s)", flush=True)
        for g in range(1, n_groups + 1):
            stem = "v_%s_g%02d" % (cname, g)
            source_map[stem] = source_id
            source_id += 1
            nfs = [n_frames + rng.randint(0, 8) for _ in range(n_clips)]
            if short_frac > 0.0 and g < cut:
                nfs = [max(4, n_frames // 3)
                       if rng.rand() < short_frac else nf for nf in nfs]
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
                if content == "learnable" and in_memory:
                    name = "%s/%s" % (cname, vid)
                    mem_rgb[name] = _encode_frames(long_rgb[off:off + nf])
                    if flow:
                        mem_flow[name] = _encode_frames(
                            long_flow[off:off + max(1, nf - 1)])
                    off += nf
                elif content == "learnable":
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
    # (UCF-style group-disjoint split files; `cut` computed up front)
    train = [r for r in rows if r[2] < cut or n_groups == 1]
    test = [r for r in rows if r[2] >= cut and n_groups > 1]
    for name, subset in (("train", train), ("test", test or train)):
        with open(os.path.join(meta_dir, "%s_split01.csv" % name), "w") as f:
            for path, nf, _ in subset:
                f.write("%s,%d\n" % (path, nf))

    db_path = os.path.join(root, "ucf101_frame.lmdb")
    db_path_flow = (os.path.join(root, "ucf101_tvl1_frame.lmdb")
                    if flow else None)
    if in_memory:
        from coclr_tpu.data.convert import make_dataset_lmdb_from_videos

        make_dataset_lmdb_from_videos(mem_rgb, db_path)
        if flow:
            make_dataset_lmdb_from_videos(mem_flow, db_path_flow)
    else:
        make_dataset_lmdb(frames_dir, db_path, workers=4)
        if flow:
            make_dataset_lmdb(flow_dir, db_path_flow, workers=4)

    return {"root": meta_dir, "db_path": db_path, "db_path_flow": db_path_flow}


def make_synthetic_k400(root: str, n_classes: int = 2, n_videos: int = 4,
                        n_frames: int = 24, size: Tuple[int, int] = (64, 80),
                        flow: bool = False, seed: int = 0,
                        in_memory: bool = False, frames_unique: int = 6,
                        splits=("train", "val"), progress: bool = False):
    """K400-shaped dataset: '<class>/<video>' CSV rows (no trailing slash),
    {train,val}_split.csv, video_source.json keyed by vname
    (lmdb_dataset.py:569-575,823).

    in_memory (round 5, for K400-SCALE builds — VERDICT-r4 ask #6 needs
    O(30-60k) videos, unbuildable through the frames-dir path in bounded
    time): JPEG byte lists go straight into the LMDB
    (convert.make_dataset_lmdb_from_videos), and each video renders+
    encodes only `frames_unique` distinct frames which CYCLE through its
    `nf` stored slots (byte-string reuse — the LMDB stores every frame,
    the loader decodes every frame; only the ENCODE count shrinks ~8x).
    The content is random texture, not the learnable class code: a 1-epoch
    scale drive measures the data path and queue dynamics, not accuracy.
    `splits` limits which LMDB files are written (train and val contain
    the same record set, as in the frames-dir path; each file is a full
    copy, so skip 'val' when only pretraining)."""
    rng = np.random.RandomState(seed)
    meta_dir = os.path.join(root, "meta")
    frames_dir = os.path.join(root, "frame")
    flow_dir = os.path.join(root, "flow")
    os.makedirs(meta_dir, exist_ok=True)
    mem_rgb = {} if in_memory else None
    mem_flow = {} if in_memory else None

    classes = ["action%03d" % i for i in range(n_classes)]
    rows = []
    source_map = {}
    t0 = time.time()
    for ci, cname in enumerate(classes):
        if progress and ci % 20 == 0:
            print(f"[synth-k400] class {ci}/{n_classes} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        for v in range(n_videos):
            vid = "vid_%s_%03d" % (cname, v)
            nf = n_frames + rng.randint(0, 8)
            if in_memory:
                name = "%s/%s" % (cname, vid)
                h, w = size
                nu = min(frames_unique, nf)
                base = rng.randint(0, 255, size=(h, w, 3), dtype=np.uint8)
                frames = np.clip(
                    base[None].astype(np.int16)
                    + rng.randint(-20, 20, size=(nu, h, w, 3)),
                    0, 255).astype(np.uint8)
                enc = _encode_frames(frames)
                mem_rgb[name] = [enc[i % nu] for i in range(nf)]
                if flow:
                    nff = max(1, nf - 1)
                    mem_flow[name] = [enc[(i + 1) % nu] for i in range(nff)]
            else:
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
    for split in splits:
        db = os.path.join(root, "k400_frame_%s.lmdb" % split)
        if in_memory:
            from coclr_tpu.data.convert import make_dataset_lmdb_from_videos

            make_dataset_lmdb_from_videos(mem_rgb, db)
        else:
            make_dataset_lmdb(frames_dir, db, workers=4)
        out["db_path_%s" % split] = db
    if flow:
        for split in splits:
            db = os.path.join(root, "k400_tvl1_frame_%s.lmdb" % split)
            if in_memory:
                from coclr_tpu.data.convert import (
                    make_dataset_lmdb_from_videos)

                make_dataset_lmdb_from_videos(mem_flow, db)
            else:
                make_dataset_lmdb(flow_dir, db, workers=4)
            out["db_path_flow_%s" % split] = db
    return out
