"""Per-op golden tests: device augmentation vs the host chain
(data/transforms.py — the golden reference, itself a behavior-port of
reference roi_data/reid.py:249-392).

Strategy: the host ops draw their parameters from a RandomState; a
scripted FakeRng forces specific draws so both paths see IDENTICAL
transform parameters, then outputs are compared — exact for flip /
crops / erasing / resize composition, <=1 uint8 LSB for the cv2
fixed-point color/blur ops.
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pps_tpu.data import device_augment as da
from pps_tpu.data import transforms

MEANS = np.array([[[102.9801, 115.9465, 122.7717]]])


class FakeRng(object):
    """Scripted stand-in for numpy RandomState: returns queued values."""

    def __init__(self, uniforms=(), randints=()):
        self._u = list(uniforms)
        self._r = list(randints)

    def uniform(self, *a, **k):
        return self._u.pop(0)

    def randint(self, *a, **k):
        return self._r.pop(0)


def _img(seed, h=64, w=32):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3)).astype(np.uint8)


def _spec(**kw):
    base = dict(crop_prob=0.0, crop_ratio=1.0, hcrop_prob=0.0,
                hcrop_ratio=1.0, hsv_prob=0.0, sat_range=0, hue_range=0,
                val_range=0, blur_prob=0.0, blur_kernel=7, erase_prob=0.0,
                sl=0.02, sh=0.4, r1=0.3, out_hw=(96, 32))
    base.update(kw)
    return base


def _params_identity(b, h, w):
    return dict(ch=jnp.full((b,), h, jnp.int32),
                cw=jnp.full((b,), w, jnp.int32),
                y0=jnp.zeros((b,), jnp.int32),
                x0=jnp.zeros((b,), jnp.int32))


def test_no_aug_matches_host_prep():
    """flip + mean-subtract + bicubic resize only: exact vs host."""
    ims = np.stack([_img(i) for i in range(4)])
    flipped = np.array([False, True, False, True])
    spec = _spec()
    out = np.asarray(da.apply_augment(ims, flipped,
                                      _params_identity(4, 64, 32), spec,
                                      MEANS))
    for i in range(4):
        im = ims[i][:, ::-1, :] if flipped[i] else ims[i]
        want = transforms.prep_im_for_blob(im, MEANS, (32, 96))
        np.testing.assert_allclose(out[i], want, atol=2e-3)


@pytest.mark.parametrize('ch,cw,y0,x0', [(50, 24, 8, 3), (64, 32, 0, 0),
                                         (33, 17, 20, 10)])
def test_crop_resize_fusion_matches_host_crop(ch, cw, y0, x0):
    """A crop followed by cv2 bicubic == the fused per-sample matrix."""
    im = _img(7)
    params = dict(ch=jnp.asarray([ch]), cw=jnp.asarray([cw]),
                  y0=jnp.asarray([y0]), x0=jnp.asarray([x0]))
    out = np.asarray(da.apply_augment(im[None], None, params, _spec(),
                                      MEANS))[0]
    crop = im[y0:y0 + ch, x0:x0 + cw]
    want = transforms.prep_im_for_blob(crop, MEANS, (32, 96))
    np.testing.assert_allclose(out, want, atol=4e-3)


def test_random_erasing_exact():
    """Same rect + fill => identical pixels (pre-resize fill of the
    uint8-truncated means, in crop coordinates)."""
    im = _img(3)
    er = dict(_params_identity(1, 64, 32),
              erase_on=jnp.asarray([True]), er_y=jnp.asarray([10]),
              er_x=jnp.asarray([5]), er_h=jnp.asarray([20]),
              er_w=jnp.asarray([12]))
    out = np.asarray(da.apply_augment(im[None], None, er, _spec(), MEANS))[0]
    him = im.copy()
    for c in range(3):
        him[10:30, 5:17, c] = MEANS[0, 0, c]  # uint8 assignment truncates
    want = transforms.prep_im_for_blob(him, MEANS, (32, 96))
    np.testing.assert_allclose(out, want, atol=2e-3)


def test_hsv_roundtrip_matches_cv2():
    """rgb2hsv_u8 reproduces cv2's u8 fixed point exactly; the jittered
    round trip stays within 1 LSB of the host op."""
    im = _img(11, h=32, w=16)
    ours = np.asarray(da.rgb2hsv_u8(jnp.asarray(im, jnp.int32)))
    want = cv2.cvtColor(im, cv2.COLOR_RGB2HSV).astype(np.int32)
    np.testing.assert_array_equal(ours, want)

    for seed, (ds, dh, dv) in enumerate([(12, -7, 25), (-30, 14, -3),
                                         (60, 0, 0)]):
        im = _img(20 + seed, h=32, w=16)
        # host: uniform gate (fire), then sat/hue/value randints
        host = transforms.hsv_jitter(
            im, FakeRng(uniforms=[0.0], randints=[ds, dh, dv]),
            prob=1.0, saturation_range=64, hue_range=32, value_range=32)
        dev = np.asarray(da.hsv_jitter_u8(
            jnp.asarray(im[None], jnp.int32), jnp.asarray([ds]),
            jnp.asarray([dh]), jnp.asarray([dv])))[0]
        diff = np.abs(dev.astype(int) - host.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.05  # near-exact


@pytest.mark.parametrize('k', [1, 3, 5])
def test_gaussian_blur_matches_cv2(k):
    im = _img(9)
    want = cv2.GaussianBlur(im, (k, k), 0).astype(int)
    taps = jnp.asarray([da._BLUR_TAPS[k]], jnp.float32)
    got = np.asarray(da.gaussian_blur_u8(
        jnp.asarray(im[None], jnp.int32), taps))[0]
    assert np.abs(got - want).max() <= 1


def test_sampled_erase_distribution():
    """erase fires ~prob of the time and always lands inside the crop."""
    spec = _spec(erase_prob=0.5)
    p = da.sample_params(jax.random.PRNGKey(0), spec, 512, (64, 32))
    on = np.asarray(p['erase_on'])
    assert 0.35 < on.mean() < 0.65
    y2 = np.asarray(p['er_y'] + p['er_h'])
    x2 = np.asarray(p['er_x'] + p['er_w'])
    assert (y2[on] <= 64).all() and (x2[on] <= 32).all()
    assert (np.asarray(p['er_h'])[on] > 0).all()


def test_sampled_crop_bounds():
    spec = _spec(crop_prob=1.0, crop_ratio=0.7, hcrop_prob=1.0,
                 hcrop_ratio=0.8)
    p = da.sample_params(jax.random.PRNGKey(1), spec, 256, (64, 32))
    ch, cw = np.asarray(p['ch']), np.asarray(p['cw'])
    y0, x0 = np.asarray(p['y0']), np.asarray(p['x0'])
    assert (ch >= int(64 * 0.7 * 0.8) - 1).all() and (ch <= 64).all()
    assert (cw >= int(32 * 0.7) - 1).all() and (cw <= 32).all()
    assert (y0 + ch <= 64).all() and (x0 + cw <= 32).all()


def test_full_pipeline_jits_and_is_deterministic():
    spec = _spec(crop_prob=0.3, crop_ratio=0.85, hsv_prob=0.3, sat_range=20,
                 hue_range=10, val_range=10, blur_prob=0.3, blur_kernel=5,
                 erase_prob=0.4)
    ims = np.stack([_img(i) for i in range(8)])
    flipped = np.arange(8) % 2 == 0
    fn = jax.jit(lambda key: da.augment_batch(key, ims, flipped, spec,
                                              MEANS))
    a = np.asarray(fn(jax.random.PRNGKey(5)))
    b = np.asarray(fn(jax.random.PRNGKey(5)))
    c = np.asarray(fn(jax.random.PRNGKey(6)))
    assert a.shape == (8, 96, 32, 3)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1.0  # different key, different augs
    assert np.isfinite(a).all()


# ---------------------------------------------------------------------------
# padded variable-size wire (valid_hw)
# ---------------------------------------------------------------------------


def _pad_reflect(im, ph, pw):
    return np.pad(im, ((0, ph - im.shape[0]), (0, pw - im.shape[1]),
                       (0, 0)), mode='reflect')


def _slice_params(params, i):
    return {k: v[i:i + 1] for k, v in params.items()}


def test_padded_valid_hw_matches_exact_size():
    """Full augmentation chain on a reflect-padded mixed-size batch ==
    running each sample at its true size (pad 0 or >= blur radius), flip
    included.  Padded samples contract the resize einsum over the bucket
    width instead of the true width, so agreement is to f32 reduction
    order (~1e-5), bitwise when the sample fills the bucket."""
    spec = _spec(crop_prob=0.5, crop_ratio=0.8, hsv_prob=0.5, sat_range=20,
                 hue_range=10, val_range=10, blur_prob=0.5, blur_kernel=5,
                 erase_prob=0.5)
    sizes = [(64, 32), (48, 24), (56, 20), (64, 32)]
    ims = [_img(i, h=h, w=w) for i, (h, w) in enumerate(sizes)]
    ph, pw = 64, 32  # pads are 0 or >= 8 > blur radius
    padded = np.stack([_pad_reflect(im, ph, pw) for im in ims])
    valid_hw = jnp.asarray(sizes, jnp.int32)
    flipped = np.array([True, True, False, False])

    params = da.sample_params(jax.random.PRNGKey(3), spec, 4,
                              (valid_hw[:, 0], valid_hw[:, 1]))
    got = np.asarray(da.apply_augment(padded, flipped, params, spec,
                                      MEANS, valid_hw=valid_hw))
    for i, im in enumerate(ims):
        want = np.asarray(da.apply_augment(
            im[None], flipped[i:i + 1], _slice_params(params, i), spec,
            MEANS))[0]
        if ims[i].shape == (64, 32, 3):
            np.testing.assert_array_equal(got[i], want)
        else:
            np.testing.assert_allclose(got[i], want, atol=1e-3)


def test_padded_draws_scale_with_valid_size():
    """Crop/erase draws are bounded by each sample's true size, not the
    bucket."""
    spec = _spec(crop_prob=1.0, crop_ratio=0.7, erase_prob=1.0)
    h = jnp.asarray([64, 40, 24], jnp.int32)
    w = jnp.asarray([32, 20, 12], jnp.int32)
    p = da.sample_params(jax.random.PRNGKey(0), spec, 3, (h, w))
    assert (np.asarray(p['y0'] + p['ch']) <= np.asarray(h)).all()
    assert (np.asarray(p['x0'] + p['cw']) <= np.asarray(w)).all()
    on = np.asarray(p['erase_on'])
    assert (np.asarray(p['er_y'] + p['er_h'])[on]
            <= np.asarray(h)[on]).all()
    assert (np.asarray(p['er_x'] + p['er_w'])[on]
            <= np.asarray(w)[on]).all()


def test_minibatch_raw_padded_wire():
    """Mixed-size raw batches ship ONE static padded shape + valid_hw."""
    from pps_tpu.config import cfg, reset_cfg, merge_cfg_from_list
    from pps_tpu.data import minibatch as mb
    reset_cfg()
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '5',
                         'REID.SCALE', '(32, 96)'])
    sizes = {1: (64, 32), 2: (48, 24), 3: (64, 32)}
    entries = [{'image': k, 'gt_class': k, 'flipped': k == 2}
               for k in (1, 2, 3)]
    decode = lambda k: _img(k, *sizes[k])
    out = mb.get_minibatch(entries, cfg, np.random.RandomState(0),
                           train=True, decode_fn=decode, raw=True,
                           raw_pad_hw=(64, 32))
    assert out['data_u8'].shape == (3, 64, 32, 3)
    np.testing.assert_array_equal(out['valid_hw'],
                                  [[64, 32], [48, 24], [64, 32]])
    np.testing.assert_array_equal(out['flipped'], [False, True, False])
    np.testing.assert_array_equal(
        out['data_u8'][1], _pad_reflect(decode(2), 64, 32))
    # a decode larger than the bucket falls back to the host chain
    big = mb.get_minibatch(entries, cfg, np.random.RandomState(0),
                           train=True, decode_fn=decode, raw=True,
                           raw_pad_hw=(48, 24))
    assert 'data' in big and 'data_u8' not in big


def test_loader_buckets_mixed_size_roidb():
    """ReIDLoader derives the dataset-global bucket from roidb metadata
    so every wire batch compiles against one shape."""
    from pps_tpu.config import cfg, reset_cfg, merge_cfg_from_list
    from pps_tpu.data.loader import ReIDLoader
    reset_cfg()
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '5', 'NUM_GPUS', '1',
                         'TRAIN.IMS_PER_BATCH', '4',
                         'REID.SCALE', '(32, 96)',
                         'REID.TRIPLET_LOSS', 'False'])
    rng = np.random.RandomState(0)
    roidb = []
    for i in range(16):
        h, w = (64, 32) if i % 2 else (48, 20)
        roidb.append({'image': (i, h, w), 'gt_class': i % 4 + 1,
                      'height': h, 'width': w, 'flipped': False})
    loader = ReIDLoader(roidb, cfg, num_workers=1, seed=0,
                        decode_fn=lambda k: _img(k[0], h=k[1], w=k[2]),
                        raw=True)
    assert loader._raw_pad_hw == (64, 32)
    n = 0
    for _i, _scale, b in loader.iter_epoch(0):
        assert b['data_u8'].shape[1:] == (64, 32, 3)
        assert b['valid_hw'].shape[1] == 2
        n += 1
    assert n > 0
