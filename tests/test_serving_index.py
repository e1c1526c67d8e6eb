"""RetrievalIndex (engine/serving.py): device-resident appendable
gallery — search parity with brute force, int8 storage, sharded
placement, growth via add().
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from pps_tpu.engine.serving import RetrievalIndex


def _data(ng=200, d=32, nq=5, seed=0):
    rng = np.random.RandomState(seed)
    g = rng.randn(ng, d).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.randn(nq, d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, g


def _brute_order(q, g):
    return np.argsort(np.linalg.norm(q[:, None] - g[None], axis=2), axis=1)


def test_f32_search_matches_brute_force():
    q, g = _data()
    idx = RetrievalIndex(g, ['p%d' % i for i in range(len(g))], int8=False)
    assert len(idx) == len(g) and idx.dim == g.shape[1]
    d, i = idx.search(q, k=10)
    np.testing.assert_array_equal(i, _brute_order(q, g)[:, :10])
    assert (np.diff(d, axis=1) >= 0).all()


def test_int8_storage_high_neighbor_recall():
    q, g = _data(seed=1)
    idx = RetrievalIndex(g, list(range(len(g))), int8=True)
    _, i8 = idx.search(q, k=10)
    ref = _brute_order(q, g)[:, :10]
    recall = np.mean([len(set(a) & set(b)) / 10.0 for a, b in zip(i8, ref)])
    assert recall >= 0.9  # int8 rows perturb distances ~1e-3
    # the exact self-match survives quantization
    d_self, i_self = idx.search(g[:3], k=1)
    np.testing.assert_array_equal(i_self[:, 0], np.arange(3))


def test_add_grows_and_single_row_query():
    q, g = _data(ng=50, seed=2)
    idx = RetrievalIndex(g, list(range(50)), int8=False)
    new = q[0]  # a known future query, 1-D row
    idx.add(new, ['new'])
    assert len(idx) == 51 and idx.paths[-1] == 'new'
    d, i = idx.search(q[0], k=1)  # 1-D query
    assert d.shape == (1, 1) and int(i[0, 0]) == 50
    assert d[0, 0] < 1e-3


def test_sharded_index_matches_unsharded():
    q, g = _data(ng=203, seed=3)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ('data', 'model'))
    labels = list(range(len(g)))
    ref = RetrievalIndex(g, labels, int8=True)
    sh = RetrievalIndex(g, labels, mesh=mesh, int8=True, shard=True)
    d_r, i_r = ref.search(q, k=7)
    d_s, i_s = sh.search(q, k=7)
    np.testing.assert_array_equal(i_s, i_r)
    np.testing.assert_allclose(d_s, d_r, rtol=1e-5, atol=1e-5)
    # growth keeps shard placement consistent
    sh.add(g[:3] + 0.01, ['a', 'b', 'c'])
    ref.add(g[:3] + 0.01, ['a', 'b', 'c'])
    d_s2, i_s2 = sh.search(q, k=7)
    d_r2, i_r2 = ref.search(q, k=7)
    np.testing.assert_array_equal(i_s2, i_r2)


def test_k_clamped_to_gallery():
    q, g = _data(ng=4, seed=4)
    idx = RetrievalIndex(g, list('abcd'), int8=False)
    d, i = idx.search(q, k=100)
    assert d.shape == (len(q), 4)
    assert set(i.ravel().tolist()) <= {0, 1, 2, 3}


def test_shard_requires_mesh():
    _, g = _data(ng=8)
    with pytest.raises(AssertionError):
        RetrievalIndex(g, list(range(8)), shard=True)


@pytest.mark.parametrize('int8', [False, True])
def test_save_load_roundtrip_bit_identical(tmp_path, int8):
    q, g = _data(seed=5)
    idx = RetrievalIndex(g, ['p%d' % i for i in range(len(g))], int8=int8)
    f = str(tmp_path / 'idx.npz')
    idx.save(f)
    loaded = RetrievalIndex.load(f)
    assert loaded.int8 == int8  # precision travels with the file
    assert loaded.paths == idx.paths
    d0, i0 = idx.search(q, k=10)
    d1, i1 = loaded.search(q, k=10)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(d1, d0)
    # the loaded index stays appendable
    loaded.add(q[0], ['new'])
    d, i = loaded.search(q[0], k=1)
    assert int(i[0, 0]) == len(g)


def test_load_into_sharded_placement(tmp_path):
    q, g = _data(ng=117, seed=6)
    idx = RetrievalIndex(g, list(range(len(g))), int8=True)
    f = str(tmp_path / 'idx.npz')
    idx.save(f)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ('data', 'model'))
    sh = RetrievalIndex.load(f, mesh=mesh, shard=True)
    d_r, i_r = idx.search(q, k=5)
    d_s, i_s = sh.search(q, k=5)
    np.testing.assert_array_equal(i_s, i_r)
    np.testing.assert_allclose(d_s, d_r, rtol=1e-5, atol=1e-5)


def test_save_is_atomic(tmp_path):
    _, g = _data(ng=8)
    idx = RetrievalIndex(g, list(range(8)), int8=True)
    f = str(tmp_path / 'idx.npz')
    idx.save(f)
    import os
    assert os.path.exists(f)
    assert not os.path.exists(f + '.tmp.npz')  # tmp renamed away


def test_search_reranked_full_shortlist_is_global_rerank():
    # with shortlist >= gallery the two-stage path must reproduce the
    # global single-query k-reciprocal re-ranking (the evaluator's
    # golden re_ranking) exactly: same candidate set, same math — only
    # the row order differs (shortlist is distance-sorted), which the
    # algorithm is invariant to up to float summation order
    from pps_tpu.evaluation.metrics import compute_dist
    from pps_tpu.evaluation.rerank import re_ranking
    q, g = _data(ng=60, nq=1, seed=7)
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    d, i = idx.search_reranked(q, k=60, shortlist=60, k1=20, k2=6,
                               engine='numpy')
    qg = compute_dist(q, g, 'euclidean')
    qq = compute_dist(q, q, 'euclidean')
    gg = compute_dist(g, g, 'euclidean')
    golden = re_ranking(qg, qq, gg, k1=20, k2=6)[0]
    np.testing.assert_array_equal(i[0], np.argsort(golden, kind='stable'))
    np.testing.assert_allclose(d[0], np.sort(golden), rtol=1e-5, atol=1e-6)


def test_search_reranked_int8_uses_dequantized_rows():
    # int8 index: the rerank math must run on the SAME dequantized rows
    # the device search scores (not the original f32 features)
    from pps_tpu.evaluation.rerank import re_ranking
    from pps_tpu.engine.serving import _euclidean
    q, g = _data(ng=40, nq=1, seed=8)
    idx = RetrievalIndex(g, list(range(len(g))), int8=True)
    d, i = idx.search_reranked(q, k=40, shortlist=40, k1=15, k2=4,
                               engine='numpy')
    rows = idx._rows_f32(np.arange(len(g)))
    golden = re_ranking(_euclidean(q, rows), np.zeros((1, 1), np.float32),
                        _euclidean(rows, rows), k1=15, k2=4)[0]
    np.testing.assert_array_equal(i[0], np.argsort(golden, kind='stable'))
    np.testing.assert_allclose(d[0], np.sort(golden), rtol=1e-5, atol=1e-6)


def test_search_reranked_shortlist_and_independence():
    q, g = _data(ng=200, nq=3, seed=9)
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    # queries sitting ON gallery rows keep their self-match at rank 1
    probes = g[[4, 77, 130]] + 1e-4
    d, i = idx.search_reranked(probes, k=5, shortlist=20)
    assert d.shape == (3, 5) and i.shape == (3, 5)
    assert list(i[:, 0]) == [4, 77, 130]
    assert (np.diff(d, axis=1) >= 0).all()
    # per-query independence: batching queries must not change results
    for qi in range(3):
        d1, i1 = idx.search_reranked(probes[qi], k=5, shortlist=20)
        np.testing.assert_array_equal(i1[0], i[qi])
        np.testing.assert_array_equal(d1[0], d[qi])


def test_search_reranked_n_valid_skips_pad_rows():
    """n_valid semantics (the SearchBatcher's bucket-padding contract):
    results equal the un-padded call row for row, and the outputs carry
    only the real rows."""
    q, g = _data(nq=5, seed=11)
    idx = RetrievalIndex(g, ['p%d' % i for i in range(len(g))], int8=False)
    padded = np.concatenate([q[:2], np.repeat(q[1:2], 3, axis=0)], axis=0)
    d_v, i_v, p_v = idx.search_reranked(padded, k=4, shortlist=16,
                                        return_paths=True, n_valid=2)
    d_r, i_r, p_r = idx.search_reranked(q[:2], k=4, shortlist=16,
                                        return_paths=True)
    assert d_v.shape == (2, 4) and i_v.shape == (2, 4)
    np.testing.assert_array_equal(i_v, i_r)
    np.testing.assert_allclose(d_v, d_r)
    assert p_v == p_r


def test_search_reranked_k_larger_than_shortlist():
    q, g = _data(ng=50, nq=2, seed=10)
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    # k > shortlist: shortlist widens to k, never truncates below it
    d, i = idx.search_reranked(q, k=30, shortlist=10)
    assert i.shape == (2, 30)
    assert (i >= 0).all()


def test_search_reranked_native_engine_matches_numpy():
    from pps_tpu import native
    if not native.available():
        pytest.skip('native rerank lib not built')
    q, g = _data(ng=80, nq=2, seed=11)
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    d_n, i_n = idx.search_reranked(q, k=10, shortlist=40, engine='numpy')
    d_c, i_c = idx.search_reranked(q, k=10, shortlist=40, engine='auto')
    # same algorithm in C++; tiny accumulation-order diffs only
    np.testing.assert_allclose(d_c, d_n, rtol=1e-4, atol=1e-5)
    # rankings may only differ where blended values are near-ties
    mismatch = i_c != i_n
    if mismatch.any():
        np.testing.assert_allclose(d_c[mismatch], d_n[mismatch], atol=1e-4)


@pytest.mark.parametrize('int8', [False, True])
def test_remove_rows(tmp_path, int8):
    q, g = _data(ng=50, seed=12)
    idx = RetrievalIndex(g, ['p%d' % i for i in range(50)], int8=int8)
    # removing unknown paths is a no-op
    assert idx.remove(['nope']) == 0 and len(idx) == 50
    # removal excludes the rows from search and keeps index->path right
    probes = g[[3, 7]] + 1e-4
    d0, i0 = idx.search(probes, k=1)
    assert [idx.paths[int(i)] for i in i0[:, 0]] == ['p3', 'p7']
    assert idx.remove(['p3', 'p7']) == 2
    assert len(idx) == 48 and 'p3' not in idx.paths
    d1, i1 = idx.search(probes, k=48)
    found = {idx.paths[int(i)] for i in i1.ravel() if int(i) >= 0}
    assert 'p3' not in found and 'p7' not in found
    # removal survives persistence
    f = str(tmp_path / 'idx.npz')
    idx.save(f)
    loaded = RetrievalIndex.load(f)
    assert len(loaded) == 48 and loaded.paths == idx.paths
    # duplicate paths: remove drops ALL matching rows
    loaded.add(np.stack([g[0], g[0]]), ['dup', 'dup'])
    assert loaded.remove(['dup']) == 2
    # emptying the index is refused
    with pytest.raises(ValueError):
        loaded.remove(loaded.paths)


# ---------------------------------------------------------------- IVF ----

def _clustered_data(n_ids=20, per=15, d=32, seed=7):
    rng = np.random.RandomState(seed)
    ids = rng.randn(n_ids, d).astype(np.float32)
    g = (np.repeat(ids, per, axis=0) +
         0.05 * rng.randn(n_ids * per, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = ids[:6] + 0.05 * rng.randn(6, d)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    return q, g


def test_ivf_search_recall_and_exact_override():
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    d_ref, i_ref = idx.search(q, k=10)
    idx.enable_ivf(nlist=20, nprobe=4, seed=0)
    assert idx.ivf_enabled
    d, i = idx.search(q, k=10)
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(i, i_ref)])
    assert recall >= 0.95, recall
    # exact=True forces the full scan and must reproduce the exact
    # neighbor ids even though the device layout is cell-sorted
    d_e, i_e = idx.search(q, k=10, exact=True)
    np.testing.assert_array_equal(i_e, i_ref)
    np.testing.assert_allclose(d_e, d_ref, atol=1e-4)
    idx.disable_ivf()
    d2, i2 = idx.search(q, k=10)
    np.testing.assert_array_equal(i2, i_ref)


def test_ivf_full_probe_matches_exact():
    q, g = _clustered_data(n_ids=8, per=10)
    idx = RetrievalIndex(g, list(range(len(g))), int8=True)
    d_ref, i_ref = idx.search(q, k=5)
    idx.enable_ivf(nlist=8, nprobe=8, budget=len(g), seed=1)
    d, i = idx.search(q, k=5)
    np.testing.assert_array_equal(i, i_ref)
    np.testing.assert_allclose(d, d_ref, atol=1e-4)


def test_ivf_add_spill_then_fold():
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    idx.enable_ivf(nlist=20, nprobe=20, budget=512, seed=0,
                   spill_limit=8)
    # exact future-query rows land in the spill tail and must be found
    idx.add(q[:4], ['n%d' % j for j in range(4)])
    assert len(idx._ivf['spill_ids']) == 4
    d, i = idx.search(q[:4], k=1)
    np.testing.assert_array_equal(i[:, 0], np.arange(len(g), len(g) + 4))
    assert np.all(d[:, 0] < 1e-3)
    # crossing spill_limit folds the tail into the sorted layout
    idx.add(q[4:6] + 0.0, ['m0', 'm1'])
    idx.add(np.tile(q[5], (7, 1)), ['t%d' % j for j in range(7)])
    assert len(idx._ivf['spill_ids']) == 0
    d, i = idx.search(q[:4], k=1)
    np.testing.assert_array_equal(i[:, 0], np.arange(len(g), len(g) + 4))


def test_ivf_remove_keeps_clustering():
    q, g = _clustered_data()
    paths = ['p%d' % j for j in range(len(g))]
    idx = RetrievalIndex(g, paths, int8=False)
    idx.enable_ivf(nlist=20, nprobe=20, budget=512, seed=0)
    d0, i0 = idx.search(q, k=3)
    # drop the current best match of query 0; next search must renumber
    best = int(i0[0, 0])
    idx.remove([paths[best]])
    assert idx.ivf_enabled and len(idx) == len(g) - 1
    d1, i1, p1 = idx.search(q, k=3, return_paths=True)
    assert paths[best] not in {p for row in p1 for p in row}


def test_ivf_save_load_roundtrip(tmp_path):
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=True)
    idx.enable_ivf(nlist=20, nprobe=4, seed=0)
    d0, i0 = idx.search(q, k=5)
    f = str(tmp_path / 'ivf_index.npz')
    idx.save(f)
    idx2 = RetrievalIndex.load(f)
    assert idx2.ivf_enabled
    assert idx2._ivf['nprobe'] == 4
    d1, i1 = idx2.search(q, k=5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, atol=1e-4)


def test_ivf_composes_with_sharding(tmp_path):
    """IVF + row-sharded placement: full probe matches the exact
    sharded scan, exact=True works over the IVF layout, adds re-place
    with assignments intact, and save/load keeps both properties."""
    q, g = _clustered_data()
    paths = list(range(len(g)))
    mesh = Mesh(np.array(jax.devices()), ('all',))
    idx = RetrievalIndex(g, paths, int8=False, shard=True, mesh=mesh)
    d_ref, i_ref = idx.search(q, k=10)
    idx.enable_ivf(nlist=20, nprobe=20, budget=len(g), seed=0)
    assert idx.ivf_enabled and idx.shard
    d, i = idx.search(q, k=10)
    np.testing.assert_array_equal(np.sort(i, axis=1),
                                  np.sort(i_ref, axis=1))
    d_e, i_e = idx.search(q, k=10, exact=True)
    np.testing.assert_array_equal(np.sort(i_e, axis=1),
                                  np.sort(i_ref, axis=1))
    # small nprobe still finds the exact self-match
    idx._ivf['nprobe'] = 2
    d1, i1 = idx.search(g[:3], k=1)
    np.testing.assert_array_equal(i1[:, 0], np.arange(3))
    # adds re-place the sharded layout with assignments intact
    idx.add(q[0], ['new'])
    d2, i2 = idx.search(q[0], k=1)
    assert int(i2[0, 0]) == len(g) and d2[0, 0] < 1e-3
    # persistence keeps the clustering; reload sharded
    f = str(tmp_path / 'sharded_ivf.npz')
    idx.save(f)
    idx2 = RetrievalIndex.load(f, mesh=mesh, shard=True)
    assert idx2.ivf_enabled and idx2.shard
    d3, i3 = idx2.search(q[0], k=1)
    assert int(i3[0, 0]) == len(g)


def test_ivf_reranked_shortlist_flows_through():
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    idx.enable_ivf(nlist=20, nprobe=20, budget=512, seed=0)
    # full-probe IVF shortlist == exact shortlist -> rerank output must
    # match the non-IVF reranked search
    d_a, i_a = idx.search_reranked(q, k=5, shortlist=30, engine='numpy')
    idx.disable_ivf()
    d_b, i_b = idx.search_reranked(q, k=5, shortlist=30, engine='numpy')
    np.testing.assert_array_equal(i_a, i_b)
    np.testing.assert_allclose(d_a, d_b, atol=1e-4)


def test_search_reranked_paths_consistent_under_concurrent_remove():
    """The O(S^2) rerank math runs OUTSIDE the index lock (so searches
    don't stall behind host rerank work), but rows/paths are snapshotted
    UNDER it — a racing remove() that renumbers every row must never
    make a returned path disagree with the row it was ranked by."""
    import threading
    rng = np.random.RandomState(7)
    d = 16
    # distinctive rows: targets far apart, chaff rows near the origin
    targets = np.eye(d, dtype=np.float32) * 5.0
    chaff = rng.randn(200, d).astype(np.float32) * 0.05
    g = np.concatenate([targets, chaff])
    paths = (['target%d' % i for i in range(d)]
             + ['chaff%d' % i for i in range(200)])
    idx = RetrievalIndex(g, paths, int8=False)

    stop = threading.Event()
    errors = []

    def churn():
        # add/remove chaff rows in a loop: every cycle renumbers the
        # whole tail of the index
        i = 0
        while not stop.is_set():
            name = 'extra%d' % i
            idx.add(rng.randn(1, d).astype(np.float32) * 0.05, [name])
            idx.remove([name])
            i += 1

    t = threading.Thread(target=churn)
    t.start()
    try:
        for it in range(60):
            ti = it % d
            q = targets[ti] + rng.randn(d).astype(np.float32) * 0.01
            dd, ii, pp = idx.search_reranked(
                q, k=3, shortlist=10, engine='numpy', return_paths=True)
            if pp[0][0] != 'target%d' % ti:
                errors.append((it, pp[0][0]))
    finally:
        stop.set()
        t.join()
    assert not errors, errors


def test_ivf_rerank_composition():
    """search_reranked over an IVF index (VERDICT r3 #3): the shortlist
    comes from the probe, the k-reciprocal rerank runs on top.  With a
    FULL probe (nprobe=nlist, budget=N) the shortlist equals the exact
    scan's, so the reranked result must match exact-mode rerank
    exactly; with a partial probe the reranked top-1 must still resolve
    self-queries (the serving regime IVF exists for)."""
    q, g = _clustered_data(n_ids=10, per=12)
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    d_ref, i_ref = idx.search_reranked(q, k=5, shortlist=30,
                                       engine='numpy')
    idx.enable_ivf(nlist=10, nprobe=10, budget=len(g), seed=0)
    d_full, i_full = idx.search_reranked(q, k=5, shortlist=30,
                                         engine='numpy')
    np.testing.assert_array_equal(i_full, i_ref)
    np.testing.assert_allclose(d_full, d_ref, atol=1e-5)

    # partial probe: self-queries (exact gallery rows) rank themselves
    # first through probe -> shortlist -> rerank
    idx2 = RetrievalIndex(g, list(range(len(g))), int8=False)
    idx2.enable_ivf(nlist=10, nprobe=3, budget=256, seed=0)
    dd, ii = idx2.search_reranked(g[:4], k=3, shortlist=20,
                                  engine='numpy')
    np.testing.assert_array_equal(ii[:, 0], np.arange(4))


def test_ivf_staleness_metric_and_roundtrip(tmp_path):
    """Centroid-staleness policy surface: 0 after training, grows with
    adds, survives save/load, None when IVF is off."""
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    assert idx.ivf_staleness is None
    idx.enable_ivf(nlist=20, nprobe=4, seed=0)
    assert idx.ivf_staleness == 0.0
    idx.add(q[:3], ['a0', 'a1', 'a2'])
    n = len(g) + 3
    assert abs(idx.ivf_staleness - 3.0 / n) < 1e-9
    p = str(tmp_path / 'ivf.npz')
    idx.save(p)
    idx2 = RetrievalIndex.load(p)
    assert abs(idx2.ivf_staleness - 3.0 / n) < 1e-9
    # re-training resets it
    idx2.enable_ivf(nlist=20, nprobe=4, seed=0)
    assert idx2.ivf_staleness == 0.0


def test_ivf_load_legacy_three_param_file(tmp_path):
    """Index files written before the staleness metric carry 3
    ivf_params values; they must load with staleness restarting at 0."""
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    idx.enable_ivf(nlist=20, nprobe=4, seed=0)
    p = str(tmp_path / 'legacy.npz')
    idx.save(p)
    data = dict(np.load(p, allow_pickle=True))
    data['ivf_params'] = data['ivf_params'][:3]
    with open(p, 'wb') as f:
        np.savez(f, **data)
    idx2 = RetrievalIndex.load(p)
    assert idx2.ivf_staleness == 0.0
    d, i = idx2.search(q, k=5)
    d_ref, i_ref = idx.search(q, k=5)
    np.testing.assert_array_equal(i, i_ref)


def test_ivf_auto_retrain_on_staleness():
    """enable_auto_retrain: append rows from unseen identity clusters
    until staleness crosses the threshold -> a background re-train
    fires, swaps centroids atomically, resets staleness, and recall on
    the new-identity queries recovers to the exact scan."""
    rng = np.random.RandomState(3)
    ids = rng.randn(20, 32).astype(np.float32)

    def rows(id_slice, per=15):
        r = (np.repeat(ids[id_slice], per, axis=0) +
             0.05 * rng.randn(len(ids[id_slice]) * per, 32))
        return (r / np.linalg.norm(r, axis=1, keepdims=True)
                ).astype(np.float32)

    g_old = rows(slice(0, 14))
    g_new = rows(slice(14, 20))
    q_new = ids[14:] + 0.05 * rng.randn(6, 32)
    q_new = (q_new / np.linalg.norm(q_new, axis=1, keepdims=True)
             ).astype(np.float32)

    idx = RetrievalIndex(g_old, ['old%d' % i for i in range(len(g_old))],
                         int8=False)
    # tiny spill_limit so appended rows fold into the STALE clustering
    # (the spill tail is scanned exactly and would mask the staleness)
    idx.enable_ivf(nlist=20, nprobe=2, budget=64, seed=0, spill_limit=8)
    idx.enable_auto_retrain(threshold=0.25)
    assert idx.retrain_count == 0

    # below threshold: no re-train
    idx.add(g_new[:15], ['new%d' % i for i in range(15)])
    assert idx.wait_retrain(timeout=60) == 0
    assert idx.ivf_staleness < 0.25

    # cross the threshold (90/300 = 0.30 appended)
    idx.add(g_new[15:], ['new%d' % i for i in range(15, len(g_new))])
    assert idx.wait_retrain(timeout=120) == 1
    assert idx.ivf_staleness == 0.0
    assert not idx.retraining

    def recall(k=10):
        d_ref, i_ref = idx.search(q_new, k=k, exact=True)
        d, i = idx.search(q_new, k=k)
        return np.mean([len(set(a) & set(b)) / float(k)
                        for a, b in zip(i, i_ref)])

    # after the re-train the new identities own real cells: the probed
    # scan finds them (nprobe=2 of 20 against a 20-cluster gallery)
    assert recall() >= 0.95

    # the swapped-in index is internally consistent: full probe budget
    # reproduces the exact scan over the re-sorted layout
    d_ref, i_ref = idx.search(q_new, k=10, exact=True)
    idx._ivf['nprobe'] = idx._ivf['nlist']
    idx._ivf['budget'] = len(idx.paths)
    d, i = idx.search(q_new, k=10)
    np.testing.assert_array_equal(i, i_ref)


def test_ivf_retrain_via_enable_ivf_on_enabled_index():
    """Re-training by calling enable_ivf on an ALREADY-enabled index
    (the manual path) keeps the index consistent: the device layout is
    cell-sorted+spill at that point, and the re-install must map the
    per-position assignments back to original row ids."""
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    d_ref, i_ref = idx.search(q, k=10)
    idx.enable_ivf(nlist=20, nprobe=4, seed=0, spill_limit=8)
    idx.add(g[:30] + 0.01, list(range(1000, 1030)))  # spill + fold
    idx.enable_ivf(nlist=20, nprobe=4, seed=1)       # re-train in place
    assert idx.ivf_staleness == 0.0
    # exact scan over the re-sorted layout matches brute force
    d_e, i_e = idx.search(q, k=10, exact=True)
    gg = np.concatenate([g, g[:30] + 0.01])
    brute = _brute_order(q, gg)[:, :10]
    np.testing.assert_array_equal(i_e, brute)


def test_ivf_auto_retrain_after_load_keeps_tuned_knobs(tmp_path):
    """A loaded index carries operating knobs (ivf_params) but no train
    recipe; an auto-retrain after load must re-install with the
    persisted — possibly operator-tuned — budget/nprobe/spill_limit
    verbatim, not silently recompute formula defaults (advisor r5)."""
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    idx.enable_ivf(nlist=20, nprobe=3, budget=640, seed=0, spill_limit=8)
    assert idx._ivf['budget'] == 640
    p = str(tmp_path / 'idx.npz')
    idx.save(p)

    idx2 = RetrievalIndex.load(p)
    assert idx2._ivf.get('train') is None  # the recipe is NOT persisted
    idx2.enable_auto_retrain(threshold=0.2)
    extra = np.concatenate([g] * 1, axis=0)[:120] + 0.01
    idx2.add(extra.astype(np.float32), list(range(2000, 2000 + len(extra))))
    assert idx2.wait_retrain(timeout=120) == 1
    assert idx2._ivf['budget'] == 640
    assert idx2._ivf['nprobe'] == 3
    assert idx2._ivf['spill_limit'] == 8
    # and the re-trained index still searches consistently
    d_e, i_e = idx2.search(q, k=10, exact=True)
    gg = np.concatenate([g, extra.astype(np.float32)])
    brute = _brute_order(q, gg)[:, :10]
    np.testing.assert_array_equal(i_e, brute)


def test_empty_index_rejected_at_construction():
    """An empty gallery has no searchable program (top-k over a
    zero-length axis is an XLA error): fail at construction with a
    real message, not inside the first search (advisor r5)."""
    with pytest.raises(ValueError, match='at least one row'):
        RetrievalIndex(np.zeros((0, 32), np.float32), [])


def test_install_aborts_when_ivf_state_changed():
    """A background re-train that finished k-means AFTER the operator
    disabled (or manually re-trained) IVF must not override that
    decision: _install_ivf(expect_gen=...) aborts on a stale
    generation (advisor r5)."""
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    idx.enable_ivf(nlist=10, nprobe=3, seed=0)
    from pps_tpu.ops.ivf import kmeans
    cent = np.asarray(kmeans(idx._host_g, 10, iters=2, seed=1,
                             g_scale=idx._host_s))
    gen = idx._ivf_gen
    idx.disable_ivf()  # operator turns IVF off while "k-means" ran
    assert idx._install_ivf(cent, nprobe=3, budget=None, spill_limit=8,
                            train=None, expect_gen=gen) is False
    assert idx._ivf is None  # the explicit disable stands
    # current-generation install still works (the non-stale path)
    assert idx._install_ivf(cent, nprobe=3, budget=None, spill_limit=8,
                            train=None,
                            expect_gen=idx._ivf_gen) is True
    assert idx.ivf_enabled


def test_search_k_bucketing_slices_to_requested_k():
    """search buckets k to a power of two internally (bounding the
    compiled top-k program set against client-swept k values) and
    slices back: results at any k equal the first k columns of the
    exact brute-force order."""
    q, g = _clustered_data()
    idx = RetrievalIndex(g, list(range(len(g))), int8=False)
    brute = _brute_order(q, g)
    for k in (1, 3, 5, 7, 100, len(g)):
        d, i = idx.search(q, k=k)
        assert i.shape == (len(q), min(k, len(g)))
        np.testing.assert_array_equal(i, brute[:, :min(k, len(g))])
