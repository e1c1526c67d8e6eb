"""Image augmentation + preprocessing, numpy/cv2 host-side.

Behavior-compatible rebuild of the reference augmentation chain
(/root/reference/detectron/roi_data/reid.py:249-392) and blob prep
(/root/reference/detectron/utils/blob.py:97-117), applied in the reference
order (reference roi_data/minibatch.py:130-140):

  decode BGR -> flip -> random_crop -> horizontal_crop -> hsv_jitter
  -> gaussian_blur -> random_erasing -> (float32, -PIXEL_MEANS)
  -> cv2.resize(REID.SCALE, INTER_CUBIC)

Deliberately-preserved reference quirks:
  * hsv_jitter converts with COLOR_RGB2HSV even though the array is BGR
    (reid.py:328) — channel roles are swapped but the training
    distribution is what the published models saw.
  * random_erasing runs BEFORE resize and fills with PIXEL_MEANS in BGR
    order (reid.py:364-392).
  * mean subtraction happens BEFORE the bicubic resize (blob.py:106-114).

All randomness flows through an explicit ``numpy.random.RandomState`` so
loader workers are seedable/deterministic (the reference used process
globals).  Output is NHWC float32 — the TPU-friendly layout; the
reference's NCHW transpose (blob.py:92-94) is a GPU-ism we drop.
"""

import math

import cv2
import numpy as np

# cv2 ops are internally multi-threaded by default, which fights the
# loader's worker pool (oversubscription makes N workers SLOWER than 1 —
# measured 594 -> 231 imgs/s at 2 workers).  Parallelism comes from our
# pools instead, same policy as torch's DataLoader workers.
cv2.setNumThreads(0)


def random_crop(im, rng, crop_prob, crop_ratio):
    """reid.py:249-268."""
    assert 0.0 <= crop_prob <= 1.0
    if crop_prob == 0 or rng.uniform() > crop_prob:
        return im
    assert 0.0 < crop_ratio < 1.0
    h_ratio = rng.uniform(crop_ratio, 1)
    w_ratio = rng.uniform(crop_ratio, 1)
    crop_h = int(im.shape[0] * h_ratio)
    crop_w = int(im.shape[1] * w_ratio)
    h_start = rng.randint(0, im.shape[0] - crop_h)
    w_start = rng.randint(0, im.shape[1] - crop_w)
    return np.copy(im[h_start:h_start + crop_h, w_start:w_start + crop_w, :])


def horizontal_crop(im, rng, prob, ratio):
    """Crop the bottom off tall images (reid.py:271-284); only fires when
    the aspect ratio h/w exceeds 1.5."""
    if (ratio < 1 and prob > 0 and rng.uniform() < prob
            and im.shape[0] * 1.0 / im.shape[1] > 1.5):
        h_ratio = rng.uniform(ratio, 1)
        crop_h = int(im.shape[0] * h_ratio)
        return im[0:crop_h]
    return im


def hsv_jitter(im, rng, prob, saturation_range, hue_range, value_range):
    """reid.py:316-345 (including the RGB2HSV-on-BGR quirk)."""
    assert 0.0 <= prob <= 1.0
    if prob == 0 or rng.uniform() > prob:
        return im
    im_hsv = cv2.cvtColor(im, cv2.COLOR_RGB2HSV).astype(np.int64)
    if saturation_range > 0:
        im_hsv[:, :, 1] += rng.randint(-saturation_range, saturation_range)
    if hue_range > 0:
        im_hsv[:, :, 0] += rng.randint(-hue_range, hue_range)
    if value_range > 0:
        im_hsv[:, :, 2] += rng.randint(-value_range, value_range)
    im_hsv = np.clip(im_hsv, 0, 255).astype(np.uint8)
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)


def gaussian_blur(im, rng, prob, max_kernel):
    """reid.py:348-357; odd kernel size sampled from 1..max_kernel-1."""
    if prob == 0 or rng.uniform() > prob:
        return im
    sizes = list(range(1, max_kernel, 2))
    k = sizes[rng.randint(0, len(sizes))]
    return cv2.GaussianBlur(im, (k, k), 0)


def random_erasing(im, rng, prob, pixel_means, sl=0.02, sh=0.4, r1=0.3):
    """Zhong et al. random erasing, pre-resize, mean-fill
    (reid.py:360-392)."""
    if prob == 0 or rng.uniform(0, 1) > prob:
        return im
    for _ in range(100):
        area = im.shape[0] * im.shape[1]
        target_area = rng.uniform(sl, sh) * area
        aspect_ratio = rng.uniform(r1, 1.0 / r1)
        h = int(round(math.sqrt(target_area * aspect_ratio)))
        w = int(round(math.sqrt(target_area / aspect_ratio)))
        if w < im.shape[1] and h < im.shape[0]:
            x1 = rng.randint(0, im.shape[0] - h + 1)
            y1 = rng.randint(0, im.shape[1] - w + 1)
            im = im.copy()
            for c in range(im.shape[2]):
                im[x1:x1 + h, y1:y1 + w, c] = pixel_means[0, 0, c]
            return im
    return im


def augment(im, rng, cfg):
    """The full training chain in reference order."""
    reid = cfg.REID
    im = random_crop(im, rng, reid.CROP_PROB, reid.CROP_RATIO)
    im = horizontal_crop(im, rng, reid.HORIZONTAL_CROP_PROB,
                         reid.HORIZONTAL_CROP_RATIO)
    im = hsv_jitter(im, rng, reid.HSV_JITTER_PROB,
                    int(reid.SATURATION_RANGE), int(reid.HUE_RANGE),
                    int(reid.VALUE_RANGE))
    im = gaussian_blur(im, rng, reid.GAUSSIAN_BLUR_PROB,
                       reid.GAUSSIAN_BLUR_KERNEL)
    im = random_erasing(im, rng, reid.RANDOM_ERASING_PROB,
                        np.asarray(cfg.PIXEL_MEANS),
                        sl=reid.SL, sh=reid.SH, r1=reid.R1)
    return im


def prep_im_for_blob(im, pixel_means, scale_wh):
    """float32, -mean, bicubic resize to (w, h)=REID.SCALE
    (reference blob.py:97-117).  Returns NHWC float32 [h, w, 3] BGR."""
    im = im.astype(np.float32, copy=False)
    im = im - pixel_means
    return cv2.resize(im, tuple(scale_wh), interpolation=cv2.INTER_CUBIC)


def decode_image(path):
    """cv2.imread: BGR uint8, matching the reference decode."""
    im = cv2.imread(path)
    assert im is not None, 'Failed to read image {!r}'.format(path)
    return im
