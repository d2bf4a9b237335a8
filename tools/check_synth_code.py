"""Sanity-check the 2-D synthetic class code's recoverability under augs.

The full-cardinality drive rests on the premise that the 101-class
two-grating speed code (coclr_tpu/data/synthetic.py render_learnable_video)
survives the training augmentation chain (RandomSizedCrop + resize-128 +
hflip + JPEG). This tool verifies that premise WITHOUT training: a blind
FFT estimator recovers each grating's drift speed from augmented clips and
decodes the (i, j) class bands.

Estimator: per frame, 2-D FFT; split the two gratings by radial frequency
(rotation-invariant — orientation rotates through the video by design);
per band, the phase of the band-restricted correlation between consecutive
frames <F_{t+1}, F_t*> advances by the drift speed omega per frame
(rotation moves energy tangentially, common-phase advance survives the
inner product). |omega| decodes the band (hflip negates the sign; sign is
random per instance anyway).

This is in-principle evidence only — S3D sees far richer features — but a
code this estimator can't read after augs would be a red flag BEFORE
spending hours of chip time. Exit nonzero if joint accuracy < threshold.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def estimate_speeds(clip_gray: np.ndarray, r_split: float):
    """clip_gray [T, N, N] float; returns (|omega_hi|, |omega_lo|) for the
    high/low radial-frequency bands."""
    T, N, _ = clip_gray.shape
    x = clip_gray - clip_gray.mean(axis=(1, 2), keepdims=True)
    # spatial origin at the image CENTER (ifftshift): the grating rotates,
    # so its spectral peak moves by dk each step; with a corner origin the
    # window-phase term contributes dk*center ~ several rad of
    # contamination per step. With a center origin the phase AT each
    # frame's own peak is the pattern phase phi + omega*t directly.
    F = np.fft.fft2(np.fft.ifftshift(x, axes=(1, 2)))  # [T, N, N]
    fy = np.fft.fftfreq(N)[:, None] * N
    fx = np.fft.fftfreq(N)[None, :] * N
    r = np.hypot(fy, fx)
    # half-plane only: the conjugate bin F(-k) advances at -omega, so a
    # full-plane sum cancels the imaginary part (angle collapses to 0/pi)
    half = (fy > 0) | ((fy == 0) & (fx > 0))
    speeds = []
    for band in ((r > r_split) & (r < 0.45 * N) & half,
                 (r >= 2.0) & (r <= r_split) & half):
        # the orientation ROTATES through the clip (by design), sweeping
        # the spectral peak across the band — read the pattern phase at
        # each frame's OWN instantaneous peak (valid with center origin)
        peaks = []
        for t in range(T):
            mag = np.abs(F[t]) * band
            py, px = np.unravel_index(np.argmax(mag), mag.shape)
            peaks.append(F[t, py, px])
        steps = np.angle(np.asarray(peaks[1:]) * np.conj(peaks[:-1]))
        speeds.append(abs(float(np.median(steps))))
    return speeds[0], speeds[1]


def band_of(omega: float, n_bands: int) -> int:
    unit = (omega - 0.25) / 1.30
    return int(np.clip(np.floor(unit * n_bands), 0, n_bands - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_classes", default=101, type=int)
    ap.add_argument("--n_probe", default=40, type=int,
                    help="classes to probe (evenly spaced)")
    ap.add_argument("--per_class", default=3, type=int)
    ap.add_argument("--seq_len", default=32, type=int)
    ap.add_argument("--modality", default="rgb", choices=["rgb", "flow"])
    ap.add_argument("--min_acc", default=0.6, type=float)
    ap.add_argument("--seed", default=0, type=int)
    args = ap.parse_args()

    import cv2

    from coclr_tpu.data.hostaug import sample_sized_crop
    from coclr_tpu.data.synthetic import render_learnable_video

    n2 = 10
    n1 = (args.n_classes + n2 - 1) // n2
    size, out = (136, 180), 128
    # apparent split radius: gratings at lambda 7/21 (rgb) or 12/30 (flow);
    # geometric mean of the apparent-radius bands at 128 output
    lam_hi, lam_lo = (7.0, 21.0) if args.modality == "rgb" else (12.0, 30.0)
    r_split = out / np.sqrt(lam_hi * lam_lo)

    rng = np.random.RandomState(args.seed)
    cls = np.linspace(0, args.n_classes - 1, args.n_probe).astype(int)
    hit_i = hit_j = hit_joint = n = 0
    for ci in cls:
        for inst in range(args.per_class):
            vid = render_learnable_video(int(ci), args.n_classes, rng,
                                         args.seq_len, size, args.modality)
            # train-aug chain: random sized crop + resize 128 + hflip + JPEG
            x0, y0, w, h = sample_sized_crop(rng, size[1], size[0])
            crop = vid[:, y0:y0 + h, x0:x0 + w]
            frames = []
            for f in crop:
                f = cv2.resize(f, (out, out), interpolation=cv2.INTER_CUBIC)
                if inst % 2 == 1:
                    f = f[:, ::-1]
                ok, enc = cv2.imencode(".jpg", f[:, :, ::-1])
                assert ok
                f = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
                frames.append(f.astype(np.float32).mean(axis=2))
            # the crop rescales wavelength, hence the split radius too
            scale = out / np.sqrt(w * h)
            w_hi, w_lo = estimate_speeds(np.stack(frames),
                                         r_split * scale)
            i_hat, j_hat = band_of(w_hi, n1), band_of(w_lo, n2)
            i_true, j_true = int(ci) // n2, int(ci) % n2
            hit_i += i_hat == i_true
            hit_j += j_hat == j_true
            hit_joint += (i_hat == i_true) and (j_hat == j_true)
            n += 1
    acc = {"acc_i_fine_grating": round(hit_i / n, 3),
           "acc_j_coarse_grating": round(hit_j / n, 3),
           "acc_joint": round(hit_joint / n, 3),
           "n": n, "chance_joint": round(1.0 / (n1 * n2), 4),
           "modality": args.modality}
    print(json.dumps(acc))
    if acc["acc_joint"] < args.min_acc:
        sys.exit(1)


if __name__ == "__main__":
    main()
