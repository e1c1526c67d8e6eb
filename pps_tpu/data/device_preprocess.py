"""On-device image preprocessing: cv2-exact bicubic resize as MXU matmuls.

The reference preprocesses on host per image (float32, -mean,
cv2.resize INTER_CUBIC — reference utils/blob.py:97-117).  On a TPU host
that path is CPU-bound (~830 imgs/s on this harness); but bicubic resize
is a *linear* map, so for a fixed (in_size, out_size) it is exactly two
small matmuls:

    out[H', W'] = R_h [H', H] @ im [H, W] @ R_w[W', W]^T

with R built from cv2's resize semantics: src = (dst + 0.5) * in/out - 0.5,
4-tap Keys kernel with a = -0.75 (cv2's INTER_CUBIC constant; PIL and
jax.image use a = -0.5), taps clamped at the borders (BORDER_REPLICATE).
The matrices are tiny ([384, H_in]), so decode stays on host (uint8) and
cast/mean-subtract/resize all run on device, fused by XLA into the
extraction graph — the north-star "preprocessing kernels that stream
batches straight to HBM".

Golden-tested against cv2 itself in tests/test_device_preprocess.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

_CV2_A = -0.75  # cv2's bicubic coefficient (interpolation.cpp interpolateCubic)


def _keys(d, a=_CV2_A):
    d = abs(float(d))
    if d <= 1.0:
        return (a + 2.0) * d ** 3 - (a + 3.0) * d ** 2 + 1.0
    if d < 2.0:
        return a * (d ** 3 - 5.0 * d ** 2 + 8.0 * d - 4.0)
    return 0.0


def cv2_bicubic_matrix(in_size, out_size):
    """[out_size, in_size] float32 resize matrix matching cv2 INTER_CUBIC
    (including replicated borders)."""
    m = np.zeros((out_size, in_size), np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        ix = int(np.floor(src))
        t = src - ix
        for tap in range(-1, 3):
            w = _keys(tap - t)
            j = min(max(ix + tap, 0), in_size - 1)  # BORDER_REPLICATE clamp
            m[o, j] += w
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _matrices(in_hw, out_hw):
    # cache numpy (NOT jnp): a jnp array created during a jit trace would be
    # a tracer, and caching it across traces leaks it (UnexpectedTracerError
    # when a second jitted caller hits the warm cache)
    rh = cv2_bicubic_matrix(in_hw[0], out_hw[0])
    rw = cv2_bicubic_matrix(in_hw[1], out_hw[1])
    return rh, rw


def resize_bicubic(x, out_hw):
    """[B, H, W, C] float -> [B, H', W', C], cv2-INTER_CUBIC-exact."""
    rh, rw = _matrices((x.shape[1], x.shape[2]), tuple(out_hw))
    y = jnp.einsum('Oh,bhwc->bOwc', rh, x,
                   preferred_element_type=jnp.float32)
    return jnp.einsum('Ow,bHwc->bHOc', rw, y,
                      preferred_element_type=jnp.float32)


def preprocess_on_device(images_u8, pixel_means, out_hw):
    """uint8 [B, H, W, 3] BGR -> float32 [B, H', W', 3] mean-subtracted and
    resized, matching transforms.prep_im_for_blob (float32 - mean BEFORE
    the resize, reference blob.py:106-114; order is numerically irrelevant
    for a constant mean since the resize rows sum to 1, but kept anyway)."""
    x = images_u8.astype(jnp.float32) - jnp.asarray(pixel_means,
                                                    jnp.float32)
    return resize_bicubic(x, out_hw)


def preprocess_on_device_padded(images_u8, valid_hw, pixel_means, out_hw):
    """Variable-size form: uint8 [B, H_pad, W_pad, 3] decodes padded to a
    dataset-global bucket + per-sample valid_hw [B,2] -> float32
    [B, H', W', 3].  The per-sample resize matrices (device_augment's
    fused crop/resize, with the valid region as the window) never sample
    the pad, so this matches resizing each image from its true size — one
    static wire shape for heterogeneous sets like Duke/CUHK03 raw."""
    from pps_tpu.data.device_augment import crop_resize_batch
    x = images_u8.astype(jnp.float32) - jnp.asarray(pixel_means,
                                                    jnp.float32)
    zeros = jnp.zeros((x.shape[0],), jnp.int32)
    return crop_resize_batch(x, valid_hw[:, 0].astype(jnp.int32),
                             valid_hw[:, 1].astype(jnp.int32),
                             zeros, zeros, tuple(out_hw))


def make_device_preproc_extract(model, pixel_means, out_hw):
    """jitted (params, state, uint8 images) -> embeddings with the
    preprocessing fused into the extraction graph."""
    means = np.asarray(pixel_means, np.float32)

    @jax.jit
    def fn(params, state, images_u8):
        x = preprocess_on_device(images_u8, means, out_hw)
        return model.extract_features(params, state, x)

    return fn
