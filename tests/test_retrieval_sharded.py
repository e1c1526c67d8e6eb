"""Sharded-gallery retrieval: multi-chip top-k equals the single-device
streaming path over the concatenated gallery (8-device CPU mesh).

Beyond-reference surface (the reference's retrieval is a single-host
numpy distmat, reference reid_dataset_evaluator.py:104-125); correctness
bar is bit-parity of indices and distances with `streaming_topk` on the
unsharded gallery.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from pps_tpu.ops.topk import quantize_gallery, streaming_topk
from pps_tpu.parallel.retrieval import shard_gallery, sharded_topk


def _mesh(shape=(4, 2)):
    devs = np.asarray(jax.devices()[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, ('data', 'model'))


def _rand(ng, d, seed=0):
    rng = np.random.RandomState(seed)
    g = rng.randn(ng, d).astype(np.float32)
    q = rng.randn(7, d).astype(np.float32)
    return q, g


@pytest.mark.parametrize('ng', [1024, 1003])  # even and uneven splits
def test_sharded_exact_matches_single_device(ng):
    q, g = _rand(ng, 32)
    mesh = _mesh()
    gd, sd, n = shard_gallery(g, mesh, int8=False)
    assert sd is None and n == ng
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=10, chunk=128, mesh=mesh)
    d_r, i_r = streaming_topk(q, g, k=10, chunk=128)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-5,
                               atol=1e-5)


def test_sharded_int8_matches_single_device_int8():
    q, g = _rand(1003, 48, seed=1)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    mesh = _mesh()
    gd, sd, n = shard_gallery(g, mesh, int8=True)
    assert gd.dtype == np.int8 and sd is not None
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=10, chunk=256,
                            g_scale=sd, mesh=mesh)
    g8, sc = quantize_gallery(g)
    d_r, i_r = streaming_topk(q, g8, k=10, chunk=256, g_scale=sc)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-5,
                               atol=1e-5)


def test_k_larger_than_shard_rows():
    # 8 shards x 8 rows; k=20 forces the merge to pull from many shards
    q, g = _rand(64, 16, seed=2)
    mesh = _mesh()
    gd, _, n = shard_gallery(g, mesh, int8=False)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=20, chunk=8, mesh=mesh)
    d_r, i_r = streaming_topk(q, g, k=20, chunk=64)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-5,
                               atol=1e-5)


def test_k_larger_than_gallery():
    q, g = _rand(5, 16, seed=3)  # fewer rows than shards: some shards empty
    mesh = _mesh()
    gd, _, n = shard_gallery(g, mesh, int8=False)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=5, chunk=4, mesh=mesh)
    full = np.linalg.norm(q[:, None] - g[None], axis=2)
    order = np.argsort(full, axis=1)
    np.testing.assert_array_equal(np.asarray(i_s), order)
    # no pad row ever leaks out
    assert np.asarray(i_s).max() < n


def test_approx_path_runs_and_overlaps_exact():
    q, g = _rand(4096, 24, seed=4)
    mesh = _mesh()
    gd, _, n = shard_gallery(g, mesh, int8=False)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=10, chunk=512,
                            recall_target=0.95, mesh=mesh)
    _, i_r = streaming_topk(q, g, k=10, chunk=512)
    i_s, i_r = np.asarray(i_s), np.asarray(i_r)
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(i_s, i_r)])
    assert recall >= 0.95
    assert i_s.max() < n and i_s.min() >= 0


def test_flat_one_axis_mesh():
    q, g = _rand(777, 16, seed=5)
    devs = np.asarray(jax.devices()).reshape(8)
    mesh = Mesh(devs, ('data',))
    gd, sd, n = shard_gallery(g, mesh, int8=True)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=7, g_scale=sd, mesh=mesh)
    g8, sc = quantize_gallery(g)
    d_r, i_r = streaming_topk(q, g8, k=7, g_scale=sc)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))


# ------------------------------------------------------------ IVF ------

def _clustered(n_ids=24, per=20, d=32, seed=5):
    rng = np.random.RandomState(seed)
    ids = rng.randn(n_ids, d).astype(np.float32)
    g = (np.repeat(ids, per, axis=0) +
         0.05 * rng.randn(n_ids * per, d)).astype(np.float32)
    nq = min(7, n_ids)
    q = (ids[:nq] + 0.05 * rng.randn(nq, d)).astype(np.float32)
    return q, g


def test_sharded_ivf_full_probe_matches_single_device_ivf():
    """Full probe + ample budget: the sharded IVF must return exactly
    the single-device IVF's neighbor set (which itself equals the exact
    scan) — the round-robin cell split changes WHERE rows live, not
    which rows a probe covers."""
    from pps_tpu.ops.ivf import (assign_clusters, build_ivf, ivf_topk,
                                 kmeans)
    from pps_tpu.parallel.retrieval import (shard_ivf_gallery,
                                            sharded_ivf_topk)
    q, g = _clustered()
    nlist = 24
    cent = kmeans(g, nlist, iters=6, seed=0)
    assign = assign_clusters(g, cent)
    mesh = _mesh()
    placed = shard_ivf_gallery(g, assign, nlist, mesh)
    d_s, i_s = sharded_ivf_topk(q, cent, placed, k=10, nprobe=nlist,
                                budget=len(g), mesh=mesh)
    perm, starts = build_ivf(assign, nlist)
    d_r, pos = ivf_topk(q, g[perm], cent, starts, k=10, nprobe=nlist,
                        budget=len(g))
    i_r = perm[np.asarray(pos)]
    # same neighbor sets; order can differ only among equal distances
    np.testing.assert_array_equal(np.sort(np.asarray(i_s), axis=1),
                                  np.sort(i_r, axis=1))
    np.testing.assert_allclose(np.sort(np.asarray(d_s), axis=1),
                               np.sort(np.asarray(d_r), axis=1),
                               atol=2e-4)


def test_sharded_ivf_small_nprobe_recall():
    from pps_tpu.ops.ivf import assign_clusters, kmeans
    from pps_tpu.parallel.retrieval import (shard_ivf_gallery,
                                            sharded_ivf_topk)
    q, g = _clustered(n_ids=32, per=30, seed=6)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    nlist = 32
    cent = kmeans(g, nlist, iters=8, seed=0)
    assign = assign_clusters(g, cent)
    mesh = _mesh()
    # int8 rows through the same placement
    g8, sc = quantize_gallery(g)
    placed = shard_ivf_gallery(np.asarray(g8), assign, nlist, mesh,
                               g_scale=np.asarray(sc))
    d_s, i_s = sharded_ivf_topk(q, cent, placed, k=10, nprobe=4,
                                budget=2048, mesh=mesh)
    _, i_r = streaming_topk(q, g8, k=10, chunk=256, g_scale=sc)
    i_r = np.asarray(i_r)
    hits = sum(len(set(np.asarray(i_s)[r].tolist()) &
                   set(i_r[r].tolist())) for r in range(q.shape[0]))
    assert hits / i_r.size >= 0.95
    # ids are original row ids, deduplicated per query
    for r in range(q.shape[0]):
        row = np.asarray(i_s)[r]
        row = row[row >= 0]
        assert len(set(row.tolist())) == len(row)
        assert row.max() < len(g)


def test_sharded_ivf_k_exceeds_candidates():
    from pps_tpu.ops.ivf import assign_clusters, kmeans
    from pps_tpu.parallel.retrieval import (shard_ivf_gallery,
                                            sharded_ivf_topk)
    q, g = _clustered(n_ids=4, per=8, seed=7)
    cent = kmeans(g, 4, iters=4, seed=0)
    assign = assign_clusters(g, cent)
    mesh = _mesh()
    placed = shard_ivf_gallery(g, assign, 4, mesh)
    d_s, i_s = sharded_ivf_topk(q[:2], cent, placed, k=50, nprobe=1,
                                budget=64, mesh=mesh)
    d_s, i_s = np.asarray(d_s), np.asarray(i_s)
    assert np.all(np.isinf(d_s[i_s < 0]))
    assert (i_s >= 0).any()


def test_sharded_ivf_exact_scan_over_placement():
    """exact=True over the IVF placement reproduces the ground-truth
    scan (pad rows masked, ids mapped back through the per-shard perm)."""
    from pps_tpu.ops.ivf import assign_clusters, kmeans
    from pps_tpu.parallel.retrieval import (shard_ivf_gallery,
                                            sharded_ivf_topk)
    q, g = _clustered(n_ids=16, per=13, seed=8)  # uneven cells
    cent = kmeans(g, 16, iters=5, seed=0)
    assign = assign_clusters(g, cent)
    mesh = _mesh()
    placed = shard_ivf_gallery(g, assign, 16, mesh)
    d_s, i_s = sharded_ivf_topk(q, cent, placed, k=9, nprobe=2,
                                budget=64, mesh=mesh, exact=True)
    d_r, i_r = streaming_topk(q, g, k=9, chunk=64)
    np.testing.assert_array_equal(np.sort(np.asarray(i_s), axis=1),
                                  np.sort(np.asarray(i_r), axis=1))
    np.testing.assert_allclose(np.sort(np.asarray(d_s), axis=1),
                               np.sort(np.asarray(d_r), axis=1),
                               atol=2e-4)
