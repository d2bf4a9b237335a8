"""Host-side augmentation: JPEG decode + crop/resize only.

The split of the reference's CPU/PIL pipeline (/root/reference/utils/
augmentation.py) between host and device is chosen at the crop boundary:

  HOST (here):   RandomSizedCrop / CenterCrop / FiveCrop / Scale — these must
                 see full-resolution frames, and doing them at decode time
                 shrinks the host->device transfer ~5x (128^2 crops instead of
                 256x320 frames).
  DEVICE:        ColorJitter / RandomGray / GaussianBlur / HFlip / Normalize
                 (coclr_tpu/ops/augment.py), driven by per-clip `aug_base`
                 flags emitted here (TwoClip p=0.3 base-vs-null / OneClip
                 policy, augmentation.py:380-448).

Crop parameter distributions are exact ports: 10 rejection attempts over
(area, aspect), optional w/h swap, Scale+CenterCrop fallback
(augmentation.py:99-146). cv2 INTER_CUBIC stands in for PIL BICUBIC.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)  # we parallelize at the sample level


def decode_jpeg(raw: bytes) -> np.ndarray:
    """JPEG bytes -> RGB uint8 [H, W, 3] (PIL .convert('RGB') parity)."""
    arr = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
    if arr is None:
        raise ValueError("JPEG decode failed")
    return arr[:, :, ::-1]  # BGR -> RGB


def sample_sized_crop(rng: np.random.RandomState, w_img: int, h_img: int,
                      bottom_area: float = 0.2) -> Tuple[int, int, int, int]:
    """One (x, y, w, h) draw of RandomSizedCrop (augmentation.py:101-143)."""
    for _ in range(10):
        area = rng.uniform(bottom_area, 1.0) * (w_img * h_img)
        aspect = rng.uniform(3.0 / 4, 4.0 / 3)
        w = int(round(np.sqrt(area * aspect)))
        h = int(round(np.sqrt(area / aspect)))
        if rng.rand() < 0.5:
            w, h = h, w
        if w <= w_img and h <= h_img:
            x = rng.randint(0, w_img - w + 1)
            y = rng.randint(0, h_img - h + 1)
            return x, y, w, h
    # fallback = Scale(size) + CenterCrop(size) == centered square of the
    # short side (augmentation.py:140-143)
    side = min(w_img, h_img)
    return (w_img - side) // 2, (h_img - side) // 2, side, side


def five_crop_rect(w_img: int, h_img: int, size: Tuple[int, int],
                   where: int) -> Tuple[int, int, int, int]:
    """FiveCrop (augmentation.py:61-87): 1=TL 2=TR 3=BL 4=BR 5=center.
    Note the reference's BR uses (w-tw, h-tw) — reproduced verbatim."""
    th, tw = size
    if where == 1:
        return 0, 0, tw, th
    if where == 2:
        return w_img - tw, 0, tw, th
    if where == 3:
        return 0, h_img - th, tw, th
    if where == 4:
        return w_img - tw, h_img - tw, tw, th
    x = int(round((w_img - tw) / 2.0))
    y = int(round((h_img - th) / 2.0))
    return x, y, tw, th


def center_crop_rect(w_img: int, h_img: int, size: Tuple[int, int]):
    th, tw = size
    x = int(round((w_img - tw) / 2.0))
    y = int(round((h_img - th) / 2.0))
    return x, y, tw, th


def crop_resize(frame: np.ndarray, rect, out_size: int) -> np.ndarray:
    x, y, w, h = rect
    patch = frame[y:y + h, x:x + w]
    return cv2.resize(patch, (out_size, out_size), interpolation=cv2.INTER_CUBIC)


def crop_resize_double(frame: np.ndarray, rect, mid_size: int,
                       out_size: int) -> np.ndarray:
    """crop -> resize(mid_size) -> resize(out_size), both bicubic: the
    reference eval chain RandomSizedCrop(224) + Scale(img_dim) resamples
    TWICE (eval/main_classifier.py:729-744; augmentation.py:91,120 + :22,42).
    A patch already at mid_size (the FiveCrop path, where the crop IS
    224x224) skips the intermediate pass, like the reference where FiveCrop
    crops without resizing and only Scale resamples."""
    x, y, w, h = rect
    patch = frame[y:y + h, x:x + w]
    if patch.shape[0] != mid_size or patch.shape[1] != mid_size:
        patch = cv2.resize(patch, (mid_size, mid_size),
                           interpolation=cv2.INTER_CUBIC)
    if patch.shape[0] != out_size or patch.shape[1] != out_size:
        patch = cv2.resize(patch, (out_size, out_size),
                           interpolation=cv2.INTER_CUBIC)
    return patch


class PretrainClipPolicy:
    """TwoClip / OneClip / 50-50 controller + per-clip RandomSizedCrop.

    Produces, per sample:
      windows:  which of the two sampled temporal windows each output clip
                uses (OneClip duplicates one window: augmentation.py:408-432)
      rects:    one crop rect per clip unit (consistent=False, seq_len=unit)
      aug_base: bool per clip unit — apply the jitter/gray/blur path
                (TwoClip: bernoulli(p); OneClip: exactly one of the two)
    """

    def __init__(self, img_dim: int = 128, p_base: float = 0.3,
                 bottom_area: float = 0.2, weights=(0.5, 0.5)):
        self.img_dim = img_dim
        self.p_base = p_base
        self.bottom_area = bottom_area
        self.weights = weights

    def sample(self, rng: np.random.RandomState):
        use_twoclip = rng.rand() < self.weights[0]
        if use_twoclip:
            windows = (0, 1)
            aug_base = (rng.rand() < self.p_base, rng.rand() < self.p_base)
        else:
            first_base = rng.rand() < 0.5       # (base,null) or (null,base)
            pick = 0 if rng.rand() < 0.5 else 1  # which temporal window
            windows = (pick, pick)
            aug_base = (first_base, not first_base)
        return windows, aug_base

    def sample_rect(self, rng, w_img: int, h_img: int):
        return sample_sized_crop(rng, w_img, h_img, self.bottom_area)

    def post(self, clip: np.ndarray) -> np.ndarray:
        return clip

    def crop_clip(self, rng, frames: List[np.ndarray]) -> np.ndarray:
        h_img, w_img = frames[0].shape[:2]
        rect = self.sample_rect(rng, w_img, h_img)
        return self.post(
            np.stack([crop_resize(f, rect, self.img_dim) for f in frames]))


class EvalClipPolicy:
    """Eval-side host crops (eval/main_classifier.py:729-744, test_10crop
    :456-469): consistent RandomSizedCrop(224)+Scale for train/val, or
    FiveCrop(224)+Scale for N-crop testing.

    Resampling parity: the reference resamples TWICE on the random-sized
    path — RandomSizedCrop resizes the crop to 224, then Scale(img_dim)
    resizes again (two bicubic passes) — and once on the FiveCrop path
    (the crop is already 224x224, only Scale resamples). Both chains are
    reproduced via crop_resize_double (was a documented single-pass
    divergence through round 2); the remaining pixel-level delta vs the
    reference is the repo-wide cv2-INTER_CUBIC-for-PIL-BICUBIC stand-in
    (DESIGN.md "Augmentation")."""

    def __init__(self, img_dim: int = 128, mode: str = "train",
                 crop_where: Optional[int] = None, bottom_area: float = 0.2,
                 crop_size: int = 224):
        self.img_dim = img_dim
        self.mode = mode
        self.crop_where = crop_where  # FiveCrop position for test
        self.crop_size = crop_size    # fixed-crop side (reference: 224)

    def sample_rect(self, rng, w_img: int, h_img: int):
        cs = min(self.crop_size, h_img, w_img)
        if self.crop_where is not None:
            return five_crop_rect(w_img, h_img, (cs, cs), self.crop_where)
        if self.mode in ("train", "val", "test"):
            # RandomSizedCrop(224, consistent=True) then Scale(img_dim):
            # the crop is whatever the sampler picks; output is img_dim
            return sample_sized_crop(rng, w_img, h_img, 0.2)
        return center_crop_rect(w_img, h_img, (cs, cs))

    def post(self, clip: np.ndarray) -> np.ndarray:
        return clip

    def crop_clip(self, rng, frames: List[np.ndarray]) -> np.ndarray:
        h_img, w_img = frames[0].shape[:2]
        rect = self.sample_rect(rng, w_img, h_img)
        cs = min(self.crop_size, h_img, w_img)
        return self.post(np.stack(
            [crop_resize_double(f, rect, cs, self.img_dim) for f in frames]))
