"""flat_topk (ops/topk.py): the single-dot exact scan that replaces the
streaming chunk chain for small query batches (serving single-query
path).  Contract: identical semantics to streaming_topk — Euclidean
ascending, -1/inf never-filled slots, n_valid/index_offset shard
semantics — with distances within matmul-rounding of the streaming
formulation.  Measured win on TPU: 6.06 ms vs 29.5 ms at 1M x 3968-d
int8 (BASELINE.md, tools/bench_exact_scan.py)."""

import numpy as np

from pps_tpu.ops.topk import (flat_topk, gallery_norms, quantize_gallery,
                              streaming_topk)


def _np_distmat(q, g):
    d2 = (np.square(q).sum(1)[:, None] + np.square(g).sum(1)[None, :]
          - 2.0 * q @ g.T)
    return np.sqrt(np.maximum(d2, 0.0))


def test_flat_matches_full_sort_f32():
    rng = np.random.RandomState(11)
    q = rng.randn(9, 48).astype(np.float32)
    g = rng.randn(800, 48).astype(np.float32)
    d, i = flat_topk(q, g, k=12)
    d, i = np.asarray(d), np.asarray(i)
    full = _np_distmat(q, g)
    want_i = np.argsort(full, axis=1, kind='stable')[:, :12]
    want_d = np.take_along_axis(full, want_i, axis=1)
    np.testing.assert_allclose(d, want_d, rtol=1e-4, atol=1e-4)
    got_d_by_i = np.take_along_axis(full, i, axis=1)
    np.testing.assert_allclose(got_d_by_i, want_d, rtol=1e-4, atol=1e-4)


def test_flat_matches_streaming_int8():
    """The serving case: int8 gallery + per-row scales.  Top-k sets must
    agree with the streaming scan; distances within matmul rounding
    (the hi/lo bf16 split is slightly MORE precise than the streaming
    dequant-then-bf16-dot)."""
    rng = np.random.RandomState(12)
    q = rng.randn(7, 96).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g = rng.randn(1200, 96).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    g8, sc = quantize_gallery(g)
    fd, fi = flat_topk(q, g8, k=15, g_scale=sc)
    sd, si = streaming_topk(q, g8, k=15, chunk=256, g_scale=sc)
    fd, fi = np.asarray(fd), np.asarray(fi)
    sd, si = np.asarray(sd), np.asarray(si)
    np.testing.assert_allclose(fd, sd, rtol=1e-4, atol=1e-5)
    for a, b in zip(fi, si):
        assert set(a.tolist()) == set(b.tolist())


def test_flat_precomputed_norms_bitwise():
    """g_norm handed in (the serving index caches it per placement) must
    change nothing: bitwise-equal to the compute-inside path."""
    rng = np.random.RandomState(13)
    q = rng.randn(3, 32).astype(np.float32)
    g8, sc = quantize_gallery(rng.randn(400, 32).astype(np.float32))
    gn = gallery_norms(g8, sc)
    d0, i0 = flat_topk(q, g8, k=9, g_scale=sc)
    d1, i1 = flat_topk(q, g8, k=9, g_scale=sc, g_norm=gn)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_flat_k_larger_than_gallery():
    rng = np.random.RandomState(14)
    q = rng.randn(4, 8).astype(np.float32)
    g = rng.randn(5, 8).astype(np.float32)
    d, i = flat_topk(q, g, k=100)
    assert d.shape == (4, 5)
    assert (np.asarray(i) >= 0).all()


def test_flat_n_valid_and_offset():
    """Shard semantics: rows >= n_valid score +inf/-1; real indices are
    shifted by index_offset — same contract streaming_topk honors for
    parallel/retrieval."""
    import jax.numpy as jnp
    rng = np.random.RandomState(15)
    q = rng.randn(2, 16).astype(np.float32)
    g = rng.randn(10, 16).astype(np.float32)
    gp = np.concatenate([g, np.zeros((6, 16), np.float32)])  # pad rows
    d, i = flat_topk(q, gp, k=12, n_valid=jnp.int32(10),
                     index_offset=jnp.int32(100))
    d, i = np.asarray(d), np.asarray(i)
    assert np.isinf(d[:, 10:]).all() and (i[:, 10:] == -1).all()
    full = _np_distmat(q, g)
    want_i = np.argsort(full, axis=1, kind='stable')[:, :10] + 100
    np.testing.assert_array_equal(i[:, :10], want_i)


def test_flat_crosses_subblock_boundary():
    """Ng > the 16384 hierarchical subblock: the two-level merge must
    still be exact across subblocks (nearest rows planted in each)."""
    rng = np.random.RandomState(16)
    d_dim = 8
    q = rng.randn(1, d_dim).astype(np.float32)
    g = rng.randn(20000, d_dim).astype(np.float32) * 10.0
    for planted in (5, 16390, 19999):  # one per subblock region
        g[planted] = q[0] + 1e-3 * rng.randn(d_dim)
    d, i = flat_topk(q, g, k=3)
    assert set(np.asarray(i)[0].tolist()) == {5, 16390, 19999}


def test_index_flat_and_streaming_routes_agree():
    """RetrievalIndex.search: small batches route flat, big ones stream;
    both must return the same ranking.  The budget is forced tiny to
    exercise the streaming route at test scale."""
    from pps_tpu.engine.serving import RetrievalIndex
    rng = np.random.RandomState(17)
    feats = rng.randn(300, 24).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    idx = RetrievalIndex(feats, ['p%d' % j for j in range(300)],
                         int8=True)
    q = rng.randn(5, 24).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    assert 5 * 300 <= idx.FLAT_SCAN_MAX_ELEMS  # flat route
    d_f, i_f = idx.search(q, 8)
    old = idx.FLAT_SCAN_MAX_ELEMS
    try:
        idx.FLAT_SCAN_MAX_ELEMS = 1            # force streaming route
        d_s, i_s = idx.search(q, 8)
    finally:
        idx.FLAT_SCAN_MAX_ELEMS = old
    np.testing.assert_array_equal(i_f, i_s)
    np.testing.assert_allclose(d_f, d_s, rtol=1e-4, atol=1e-5)


def test_index_add_keeps_cached_norms_consistent():
    """add() appends rows on device and extends the cached row norms;
    a post-add search must find the new nearest row (a stale/truncated
    norm cache would misrank it)."""
    from pps_tpu.engine.serving import RetrievalIndex
    rng = np.random.RandomState(18)
    feats = rng.randn(64, 16).astype(np.float32)
    idx = RetrievalIndex(feats, ['p%d' % j for j in range(64)],
                         int8=True)
    q = rng.randn(1, 16).astype(np.float32)
    idx.search(q, 4)                       # warms the norm cache
    idx.add(q + 1e-4, ['new'])             # near-duplicate of the query
    d, i, p = idx.search(q, 4, return_paths=True)
    assert p[0][0] == 'new'
    # int8 row quantization bounds how close the near-duplicate can
    # measure; typical inter-row distance here is ~sqrt(32)
    assert d[0][0] < 0.1
