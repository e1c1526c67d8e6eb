"""On-device training augmentation: uint8 wire, jax PRNG, static shapes.

TPU-first re-design of the host augmentation chain
(/root/reference/detectron/roi_data/reid.py:249-392 applied in
minibatch.py:130-140 order, then blob prep utils/blob.py:97-117):

  flip -> random_crop -> horizontal_crop -> hsv_jitter -> gaussian_blur
  -> random_erasing -> float32 - PIXEL_MEANS -> bicubic resize(REID.SCALE)

The host loader ships RAW uint8 decodes (for Market 64x128 that is ~24x
less wire traffic than resized f32) and everything else runs inside the
jitted train step.  Design notes:

* Random/horizontal crops never materialize a dynamic shape: a crop
  followed by a bicubic resize is a linear map, so both crops FUSE into
  per-sample resize matrices built in-graph from traced scalars
  (crop length/offset), evaluated as two batched MXU einsums.  With no
  crop the matrices equal data/device_preprocess.cv2_bicubic_matrix.
* All transform *parameters* are sampled in-graph from a jax PRNG keyed
  by the step rng — deterministic, replay-stable, loader-thread-free.
  The draw distributions mirror the host ops exactly; the streams differ
  (jax vs numpy RandomState), which only matters for bitwise replay of a
  host run.
* hsv_jitter reproduces cv2's uint8 fixed-point RGB2HSV (the reference's
  RGB2HSV-on-BGR quirk included: channel 0 plays the "R" role) and the
  float HSV2RGB with cvRound half-to-even.
* gaussian_blur uses cv2's fixed small-sigma kernels (sigma=0, ksize in
  {1,3,5,7}) with REFLECT_101 borders.  Cropped samples see full-image
  borders instead of crop-edge replication (documented delta; every
  shipped config runs with crops disabled).
* random_erasing is exact: same accept-reject over 100 attempts, fills
  the uint8 truncation of PIXEL_MEANS inside crop coordinates.

Golden-tested per op against data/transforms.py (the host path stays the
reference implementation) in tests/test_device_augment.py.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

_CV2_A = -0.75       # cv2 INTER_CUBIC Keys coefficient
_HSV_SHIFT = 12      # cv2 fixed-point shift for u8 HSV


# ---------------------------------------------------------------------------
# static config extraction
# ---------------------------------------------------------------------------


def augment_spec(cfg):
    """Static dict of the REID.* augmentation knobs (hashable primitives so
    the train step can close over it)."""
    r = cfg.REID
    return {
        'crop_prob': float(r.CROP_PROB),
        'crop_ratio': float(r.CROP_RATIO),
        'hcrop_prob': float(r.HORIZONTAL_CROP_PROB),
        'hcrop_ratio': float(r.HORIZONTAL_CROP_RATIO),
        'hsv_prob': float(r.HSV_JITTER_PROB),
        'sat_range': int(r.SATURATION_RANGE),
        'hue_range': int(r.HUE_RANGE),
        'val_range': int(r.VALUE_RANGE),
        'blur_prob': float(r.GAUSSIAN_BLUR_PROB),
        'blur_kernel': int(r.GAUSSIAN_BLUR_KERNEL),
        'erase_prob': float(r.RANDOM_ERASING_PROB),
        'sl': float(r.SL), 'sh': float(r.SH), 'r1': float(r.R1),
        'out_hw': (int(r.SCALE[1]), int(r.SCALE[0])),  # (H', W')
    }


# ---------------------------------------------------------------------------
# fused crop + cv2-exact bicubic resize (per-sample linear maps)
# ---------------------------------------------------------------------------


def _keys_w(d):
    """Keys cubic kernel, a=-0.75 (cv2 interpolateCubic), traced."""
    d = jnp.abs(d)
    w1 = (_CV2_A + 2.0) * d ** 3 - (_CV2_A + 3.0) * d ** 2 + 1.0
    w2 = _CV2_A * (d ** 3 - 5.0 * d ** 2 + 8.0 * d - 4.0)
    return jnp.where(d <= 1.0, w1, jnp.where(d < 2.0, w2, 0.0))


def crop_resize_matrix(out_size, in_size, crop_len, crop_start):
    """[out_size, in_size] matrix == crop rows [start, start+len) then
    cv2.resize INTER_CUBIC to out_size (BORDER_REPLICATE at the *crop*
    edges).  crop_len / crop_start are traced int scalars."""
    o = jnp.arange(out_size, dtype=jnp.float32)
    cl = crop_len.astype(jnp.float32)
    src = (o + 0.5) * (cl / out_size) - 0.5
    ix = jnp.floor(src)
    t = src - ix
    m = jnp.zeros((out_size, in_size), jnp.float32)
    for tap in range(-1, 3):
        w = _keys_w(tap - t)
        j = jnp.clip(ix + tap, 0.0, cl - 1.0).astype(jnp.int32) + crop_start
        m = m + w[:, None] * jax.nn.one_hot(j, in_size, dtype=jnp.float32)
    return m


def crop_resize_batch(x_f32, ch, cw, y0, x0, out_hw):
    """[B,H,W,C] f32 -> [B,H',W',C]: per-sample crop windows resized with
    cv2-exact bicubic, as two batched einsums (MXU work)."""
    out_h, out_w = out_hw
    in_h, in_w = x_f32.shape[1], x_f32.shape[2]
    rh = jax.vmap(lambda c, s: crop_resize_matrix(out_h, in_h, c, s))(ch, y0)
    rw = jax.vmap(lambda c, s: crop_resize_matrix(out_w, in_w, c, s))(cw, x0)
    y = jnp.einsum('bOh,bhwc->bOwc', rh, x_f32,
                   preferred_element_type=jnp.float32)
    return jnp.einsum('bOw,bHwc->bHOc', rw, y,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# cv2-u8 HSV round trip
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _hsv_tables():
    i = np.arange(256, dtype=np.float64)
    with np.errstate(divide='ignore'):
        sdiv = np.rint((255 << _HSV_SHIFT) / i)
        hdiv = np.rint((180 << _HSV_SHIFT) / (6.0 * i))
    sdiv[0] = 0
    hdiv[0] = 0
    return sdiv.astype(np.int64), hdiv.astype(np.int64)


def rgb2hsv_u8(x):
    """cv2 COLOR_RGB2HSV uint8 fixed-point semantics; x int32 [..., 3]
    where channel 0 plays the R role (the reference feeds BGR here —
    quirk preserved, reid.py:328)."""
    sdiv_t, hdiv_t = _hsv_tables()
    sdiv = jnp.asarray(sdiv_t)
    hdiv = jnp.asarray(hdiv_t)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    vmin = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - vmin
    half = 1 << (_HSV_SHIFT - 1)
    s = (diff * sdiv[v] + half) >> _HSV_SHIFT
    hraw = jnp.where(v == r, g - b,
                     jnp.where(v == g, b - r + 2 * diff,
                               r - g + 4 * diff))
    h = (hraw * hdiv[diff] + half) >> _HSV_SHIFT
    h = h + jnp.where(h < 0, 180, 0)
    return jnp.stack([h, s, v], axis=-1)


def hsv2rgb_u8(hsv):
    """cv2 COLOR_HSV2RGB uint8: float sector math + cvRound (half-even).
    Handles the reference's out-of-range H quirk (clip at 255 > 179)
    exactly like cv2's single -6 wrap."""
    h = hsv[..., 0].astype(jnp.float32) * (6.0 / 180.0)
    s = hsv[..., 1].astype(jnp.float32) * (1.0 / 255.0)
    v = hsv[..., 2].astype(jnp.float32) * (1.0 / 255.0)
    h = jnp.where(h >= 6.0, h - 6.0, h)
    sector = jnp.floor(h)
    f = h - sector
    sector = sector.astype(jnp.int32)
    tab = jnp.stack([v, v * (1.0 - s), v * (1.0 - s * f),
                     v * (1.0 - s * (1.0 - f))], axis=-1)
    # per-sector (r, g, b) -> tab index, derived against cv2 HSV2RGB
    # (tests/test_device_augment.py pins the round trip)
    sd = jnp.asarray([[0, 3, 1], [2, 0, 1], [1, 0, 3],
                      [1, 2, 0], [3, 1, 0], [0, 1, 2]], jnp.int32)
    idx = sd[jnp.clip(sector, 0, 5)]                       # [..., 3] r,g,b
    rgb = jnp.take_along_axis(tab, idx, axis=-1)
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.int32)


def hsv_jitter_u8(x, d_sat, d_hue, d_val):
    """reid.py:316-345 with traced per-sample integer deltas; int32 in/out.
    All three channels clip at [0, 255] AFTER the shift (including H —
    reference quirk, values past 179 survive into HSV2RGB)."""
    hsv = rgb2hsv_u8(x)
    shift = jnp.stack([d_hue, d_sat, d_val], axis=-1)      # [B, 3]
    hsv = hsv + shift[:, None, None, :]
    hsv = jnp.clip(hsv, 0, 255)
    return hsv2rgb_u8(hsv)


# ---------------------------------------------------------------------------
# gaussian blur (cv2 small-sigma fixed kernels, REFLECT_101)
# ---------------------------------------------------------------------------

# cv2 getGaussianKernel(ksize, sigma<=0) for ksize <= 7: fixed tables
_BLUR_TAPS = {
    1: [0, 0, 0, 1.0, 0, 0, 0],
    3: [0, 0, 0.25, 0.5, 0.25, 0, 0],
    5: [0, 0.0625, 0.25, 0.375, 0.25, 0.0625, 0],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def gaussian_blur_u8(x, taps):
    """Separable 7-tap blur with per-sample kernels; x int32 [B,H,W,3],
    taps [B, 7] (zero-padded smaller kernels).  REFLECT_101 borders
    (jnp 'reflect' pad), rounded back to u8 range."""
    xf = x.astype(jnp.float32)
    pad = 3

    def conv_axis(y, axis):
        widths = [(0, 0)] * 4
        widths[axis] = (pad, pad)
        yp = jnp.pad(y, widths, mode='reflect')
        out = jnp.zeros_like(y)
        n = y.shape[axis]
        for t in range(7):
            sl = [slice(None)] * 4
            sl[axis] = slice(t, t + n)
            w = taps[:, t][:, None, None, None]
            out = out + w * yp[tuple(sl)]
        return out

    yf = conv_axis(conv_axis(xf, 1), 2)
    return jnp.clip(jnp.round(yf), 0, 255).astype(jnp.int32)


# ---------------------------------------------------------------------------
# parameter sampling (mirrors the host op distributions)
# ---------------------------------------------------------------------------


def _randint(key, shape, low, high):
    """numpy RandomState.randint semantics: uniform over [low, high)."""
    u = jax.random.uniform(key, shape)
    return low + jnp.floor(u * (high - low)).astype(jnp.int32)


def sample_params(key, spec, batch, raw_hw):
    """All per-sample augmentation parameters, sampled in-graph.

    raw_hw may be python ints (every sample shares the full array shape)
    or per-sample [B] int arrays (padded wire: each sample's valid decode
    size — draws then scale per sample, matching what the host chain
    would draw for that image's true size)."""
    in_h, in_w = raw_hw
    ks = jax.random.split(key, 18)
    p = {}

    # random_crop (reid.py:249-268)
    ch = jnp.broadcast_to(jnp.asarray(in_h, jnp.int32), (batch,))
    cw = jnp.broadcast_to(jnp.asarray(in_w, jnp.int32), (batch,))
    y0 = jnp.zeros((batch,), jnp.int32)
    x0 = jnp.zeros((batch,), jnp.int32)
    if spec['crop_prob'] > 0:
        fire = jax.random.uniform(ks[0], (batch,)) <= spec['crop_prob']
        hr = jax.random.uniform(ks[1], (batch,), minval=spec['crop_ratio'],
                                maxval=1.0)
        wr = jax.random.uniform(ks[2], (batch,), minval=spec['crop_ratio'],
                                maxval=1.0)
        nch = (ch * hr).astype(jnp.int32)
        ncw = (cw * wr).astype(jnp.int32)
        ny0 = _randint(ks[3], (batch,), 0, jnp.maximum(ch - nch, 1))
        nx0 = _randint(ks[4], (batch,), 0, jnp.maximum(cw - ncw, 1))
        ch = jnp.where(fire, nch, ch)
        cw = jnp.where(fire, ncw, cw)
        y0 = jnp.where(fire, ny0, y0)
        x0 = jnp.where(fire, nx0, x0)

    # horizontal_crop: top slice of tall (h/w > 1.5) images (reid.py:271-284)
    if spec['hcrop_prob'] > 0 and spec['hcrop_ratio'] < 1:
        fire = ((jax.random.uniform(ks[5], (batch,)) < spec['hcrop_prob'])
                & (ch.astype(jnp.float32) / cw.astype(jnp.float32) > 1.5))
        hr = jax.random.uniform(ks[6], (batch,),
                                minval=spec['hcrop_ratio'], maxval=1.0)
        ch = jnp.where(fire, (ch * hr).astype(jnp.int32), ch)

    p.update(ch=ch, cw=cw, y0=y0, x0=x0)

    # hsv_jitter (reid.py:316-345): one integer delta per image per channel
    if spec['hsv_prob'] > 0:
        fire = jax.random.uniform(ks[7], (batch,)) <= spec['hsv_prob']
        zero = jnp.zeros((batch,), jnp.int32)
        d_sat = (_randint(ks[8], (batch,), -spec['sat_range'],
                          spec['sat_range'])
                 if spec['sat_range'] > 0 else zero)
        d_hue = (_randint(ks[9], (batch,), -spec['hue_range'],
                          spec['hue_range'])
                 if spec['hue_range'] > 0 else zero)
        d_val = (_randint(ks[10], (batch,), -spec['val_range'],
                          spec['val_range'])
                 if spec['val_range'] > 0 else zero)
        p.update(hsv_on=fire, d_sat=jnp.where(fire, d_sat, 0),
                 d_hue=jnp.where(fire, d_hue, 0),
                 d_val=jnp.where(fire, d_val, 0))

    # gaussian_blur (reid.py:348-357): odd ksize from 1..max_kernel-1
    if spec['blur_prob'] > 0:
        sizes = list(range(1, spec['blur_kernel'], 2))
        fire = jax.random.uniform(ks[11], (batch,)) <= spec['blur_prob']
        idx = _randint(ks[12], (batch,), 0, len(sizes))
        ktab = jnp.asarray([_BLUR_TAPS[s] for s in sizes], jnp.float32)
        ident = jnp.asarray(_BLUR_TAPS[1], jnp.float32)
        taps = jnp.where(fire[:, None], ktab[idx], ident[None, :])
        p.update(blur_taps=taps)

    # random_erasing (reid.py:360-392): accept-reject over 100 attempts in
    # CROP coordinates, python round() half-to-even == jnp.round
    if spec['erase_prob'] > 0:
        fire = jax.random.uniform(ks[13], (batch, 1)) <= spec['erase_prob']
        area = (ch * cw).astype(jnp.float32)[:, None]
        ta = jax.random.uniform(ks[14], (batch, 100), minval=spec['sl'],
                                maxval=spec['sh']) * area
        ar = jax.random.uniform(ks[15], (batch, 100), minval=spec['r1'],
                                maxval=1.0 / spec['r1'])
        eh = jnp.round(jnp.sqrt(ta * ar)).astype(jnp.int32)
        ew = jnp.round(jnp.sqrt(ta / ar)).astype(jnp.int32)
        valid = (ew < cw[:, None]) & (eh < ch[:, None])
        first = jnp.argmax(valid, axis=1)
        pick = lambda a: jnp.take_along_axis(a, first[:, None], 1)[:, 0]
        eh = pick(eh)
        ew = pick(ew)
        on = (fire[:, 0] & valid.any(axis=1))
        # ks[16]/ks[17]: fresh keys — splitting ks[13] again would reuse
        # the counters that produced the fire draw (key-reuse correlation)
        ex = _randint(ks[16], (batch,), 0, ch - eh + 1)  # row, crop coords
        ey = _randint(ks[17], (batch,), 0, cw - ew + 1)  # col, crop coords
        p.update(erase_on=on, er_y=y0 + ex, er_x=x0 + ey,
                 er_h=eh, er_w=ew)
    return p


# ---------------------------------------------------------------------------
# the fused pipeline
# ---------------------------------------------------------------------------


def apply_augment(x_u8, flipped, params, spec, pixel_means, valid_hw=None):
    """uint8 [B,H,W,3] + sampled params -> f32 [B,H',W',3], matching the
    host chain output (minibatch.get_minibatch train path).

    valid_hw (padded wire): [B,2] int array of each sample's true decode
    size; the array is padded bottom/right with numpy 'reflect'
    (= cv2 BORDER_REFLECT_101) on the host.  Flipping the reflect-padded
    array yields the reflect-padded flipped image with the valid region
    moved to columns [W_pad-w, W_pad), so flipped samples' column
    coordinates (crop start, erase box) shift by W_pad-w; every other op
    is unchanged — blur taps read the reflected pad content (exactly what
    jnp 'reflect' would produce at the true edge) and the resize matrices
    never sample outside the valid window.  The padded pipeline is
    bitwise-identical to running each sample at its true size, except
    blur taps that cross a 1-2 px pad (pad width below the 3 px blur
    radius double-reflects; pad 0 or >=3 is exact) — the same class of
    documented boundary delta as crop-edge blur.  With valid_hw=None
    this is the original fixed-size graph, unchanged."""
    x = jnp.asarray(x_u8).astype(jnp.int32)
    off_w = None
    if flipped is not None:
        x = jnp.where(jnp.asarray(flipped)[:, None, None, None],
                      x[:, :, ::-1, :], x)
        if valid_hw is not None:
            off_w = jnp.where(jnp.asarray(flipped),
                              x.shape[2] - valid_hw[:, 1], 0)
    if 'hsv_on' in params:
        jit_x = hsv_jitter_u8(x, params['d_sat'], params['d_hue'],
                              params['d_val'])
        x = jnp.where(params['hsv_on'][:, None, None, None], jit_x, x)
    if 'blur_taps' in params:
        x = gaussian_blur_u8(x, params['blur_taps'])
    if 'erase_on' in params:
        # fill with the uint8 truncation of PIXEL_MEANS (the reference
        # assigns float means into a uint8 array, reid.py:388-390)
        fill = jnp.asarray(
            np.asarray(pixel_means).reshape(3).astype(np.uint8).astype(
                np.int32))
        rows = jnp.arange(x.shape[1])[None, :]
        cols = jnp.arange(x.shape[2])[None, :]
        er_x = params['er_x'] if off_w is None else params['er_x'] + off_w
        rmask = ((rows >= params['er_y'][:, None]) &
                 (rows < (params['er_y'] + params['er_h'])[:, None]))
        cmask = ((cols >= er_x[:, None]) &
                 (cols < (er_x + params['er_w'])[:, None]))
        mask = (params['erase_on'][:, None, None]
                & rmask[:, :, None] & cmask[:, None, :])
        x = jnp.where(mask[..., None], fill[None, None, None, :], x)

    xf = x.astype(jnp.float32) - jnp.asarray(pixel_means,
                                             jnp.float32).reshape(1, 1, 1, 3)
    x0 = params['x0'] if off_w is None else params['x0'] + off_w
    return crop_resize_batch(xf, params['ch'], params['cw'], params['y0'],
                             x0, spec['out_hw'])


def augment_batch(key, x_u8, flipped, spec, pixel_means, valid_hw=None):
    """Sample + apply in one call (the train-step entry point)."""
    if valid_hw is None:
        raw_hw = (x_u8.shape[1], x_u8.shape[2])
    else:
        raw_hw = (valid_hw[:, 0], valid_hw[:, 1])
    params = sample_params(key, spec, x_u8.shape[0], raw_hw)
    return apply_augment(x_u8, flipped, params, spec, pixel_means,
                         valid_hw=valid_hw)
