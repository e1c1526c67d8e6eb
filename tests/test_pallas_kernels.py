"""Golden-value tests for the Pallas kernels (interpret mode on CPU; the
template is the reference's tests/test_zero_even_op.py numpy-golden
pattern)."""

import numpy as np
import pytest

from pps_tpu.ops.topk import streaming_topk
from pps_tpu.ops.pallas.zero_even import zero_even


def _np_distmat(q, g):
    d2 = (np.square(q).sum(1)[:, None] + np.square(g).sum(1)[None, :]
          - 2.0 * q @ g.T)
    return np.sqrt(np.maximum(d2, 0.0))


def test_streaming_topk_matches_full_sort():
    rng = np.random.RandomState(2)
    q = rng.randn(23, 64).astype(np.float32)
    g = rng.randn(500, 64).astype(np.float32)
    d, i = streaming_topk(q, g, k=10, chunk=128)
    d, i = np.asarray(d), np.asarray(i)
    full = _np_distmat(q, g)
    want_i = np.argsort(full, axis=1, kind='stable')[:, :10]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(d, want_d, rtol=1e-4, atol=1e-4)
    # indices may differ on exact ties; distances must agree
    got_d_by_i = np.take_along_axis(full, i, axis=1)
    np.testing.assert_allclose(got_d_by_i, want_d, rtol=1e-4, atol=1e-4)


def test_streaming_topk_k_larger_than_gallery():
    rng = np.random.RandomState(3)
    q = rng.randn(4, 8).astype(np.float32)
    g = rng.randn(5, 8).astype(np.float32)
    d, i = streaming_topk(q, g, k=100, chunk=4)
    assert d.shape == (4, 5)
    assert (np.asarray(i) >= 0).all()


def test_zero_even_golden():
    rng = np.random.RandomState(4)
    for n in (1, 7, 64, 130):
        x = rng.randn(n).astype(np.float32)
        got = np.asarray(zero_even(x, interpret=True))
        want = x.copy()
        want[0::2] = 0.0
        np.testing.assert_allclose(got, want)


def test_streaming_topk_approx_matches_exact():
    """recall_target path: hardware-approx per-chunk selection + exact
    final merge.  On CPU approx_min_k is effectively exact, so results
    match the exact path; the shapes/ordering contract is pinned here and
    the 6.7x TPU speedup + 0.9999 measured recall is in BASELINE.md."""
    import jax
    import jax.numpy as jnp
    from pps_tpu.ops.topk import streaming_topk
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(24, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(1000, 16).astype(np.float32))
    ed, ei = streaming_topk(q, g, k=10, chunk=256)
    ad, ai = streaming_topk(q, g, k=10, chunk=256, recall_target=0.95)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(ed), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(ei))


def test_streaming_topk_approx_k_exceeds_chunk():
    """k >= chunk with recall_target routes through the EXACT scan
    (per-chunk approximation has nothing to reduce) and must return the
    global top-k with bounded memory.  Regression, twice: approx_min_k
    rejects k > reduction dim (crash), and the first fix stacked whole
    chunks as candidates — the dense [Nq, Ng] matrix, an HBM OOM at
    1M-gallery scale (reachable via serve.py --approx-recall + a rerank
    shortlist above the chunk)."""
    import jax.numpy as jnp
    from pps_tpu.ops.topk import streaming_topk
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(300, 16).astype(np.float32))
    ed, ei = streaming_topk(q, g, k=40, chunk=32)
    ad, ai = streaming_topk(q, g, k=40, chunk=32, recall_target=0.95)
    np.testing.assert_allclose(np.asarray(ad), np.asarray(ed), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ai), np.asarray(ei))


def test_streaming_topk_int8_gallery():
    """int8-quantized gallery (quantize_gallery + g_scale): results equal
    the float path on the DEQUANTIZED gallery exactly, and stay near the
    f32-gallery results (L2-normalized embeddings: ~1e-3 dot error)."""
    from pps_tpu.ops.topk import quantize_gallery
    rng = np.random.RandomState(7)
    q = rng.randn(16, 64).astype(np.float32)
    g = rng.randn(700, 64).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    g8, sc = quantize_gallery(g)
    assert g8.dtype == np.int8 and sc.shape == (700,)

    d8, i8 = streaming_topk(q, g8, k=10, chunk=128, g_scale=sc)
    d8, i8 = np.asarray(d8), np.asarray(i8)
    # exact vs the dequantized gallery
    gdq = g8.astype(np.float32) * sc[:, None]
    full = _np_distmat(q, gdq)
    want_i = np.argsort(full, axis=1, kind='stable')[:, :10]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(d8, want_d, rtol=1e-4, atol=1e-4)
    # recall vs the f32 gallery: quantization moves distances by ~1e-3,
    # so the neighbor sets agree almost everywhere
    df, if_ = streaming_topk(q, g, k=10, chunk=128)
    if_ = np.asarray(if_)
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(i8, if_)])
    assert recall > 0.95, recall
    # and the approx path composes with the int8 gallery
    da, ia = streaming_topk(q, g8, k=10, chunk=128, g_scale=sc,
                            recall_target=0.95)
    assert np.asarray(da).shape == (16, 10)
