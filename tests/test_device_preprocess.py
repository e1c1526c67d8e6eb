"""Device bicubic preprocessing vs the cv2 host path (golden)."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from pps_tpu.data.device_preprocess import (cv2_bicubic_matrix,
                                            preprocess_on_device,
                                            resize_bicubic)
from pps_tpu.data.transforms import prep_im_for_blob


@pytest.mark.parametrize('in_hw,out_wh', [((128, 64), (128, 384)),
                                          ((100, 40), (32, 96)),
                                          ((256, 128), (128, 384)),
                                          ((50, 30), (64, 32))])
def test_matches_cv2_resize(in_hw, out_wh):
    rng = np.random.RandomState(0)
    im = rng.randint(0, 255, (in_hw[0], in_hw[1], 3)).astype(np.uint8)
    means = np.array([[[102.9801, 115.9465, 122.7717]]])

    want = prep_im_for_blob(im, means, out_wh)  # cv2 host path
    got = np.asarray(preprocess_on_device(
        jnp.asarray(im[None]), means, (out_wh[1], out_wh[0])))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_rows_sum_to_one():
    m = cv2_bicubic_matrix(77, 384)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


def test_upscale_downscale_batched():
    rng = np.random.RandomState(1)
    batch = rng.rand(5, 60, 28, 3).astype(np.float32) * 255
    out = np.asarray(resize_bicubic(jnp.asarray(batch), (96, 32)))
    assert out.shape == (5, 96, 32, 3)
    for i in range(5):
        want = cv2.resize(batch[i], (32, 96),
                          interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(out[i], want, atol=2e-3)
