"""Evaluator golden tests: pinned-sklearn AP math, CMC protocol, re-ranking."""

import os

import numpy as np
import pytest

from pps_tpu.evaluation import metrics
from pps_tpu.evaluation.evaluator import evaluate, parse_im_name
from pps_tpu.evaluation.rerank import re_ranking, rerank_distmat_jax


def test_average_precision_v0_18_hand_case():
    # 0.18.1 trapezoidal semantics: this case gives 0.791666...,
    # (modern sklearn step interpolation would give 0.833...)
    y_true = np.array([1, 0, 1, 0])
    y_score = np.array([0.9, 0.8, 0.7, 0.6])
    ap = metrics.average_precision_v0_18(y_true, y_score)
    np.testing.assert_allclose(ap, 0.7916666, rtol=1e-5)


def test_average_precision_perfect_ranking():
    y_true = np.array([1, 1, 0, 0])
    y_score = np.array([0.9, 0.8, 0.7, 0.6])
    assert metrics.average_precision_v0_18(y_true, y_score) == pytest.approx(
        1.0)


def test_average_precision_with_ties():
    # tied scores are grouped at one threshold (distinct-value semantics)
    y_true = np.array([1, 0, 1, 0])
    y_score = np.array([0.5, 0.5, 0.5, 0.5])
    ap = metrics.average_precision_v0_18(y_true, y_score)
    # single threshold: precision 0.5 recall 1; curve [(1, .5), (0, 1)]
    np.testing.assert_allclose(ap, 0.75, rtol=1e-6)


def test_cmc_first_match_break():
    # 2 queries, 4 gallery; distances rank gallery manually
    dist = np.array([
        [0.1, 0.2, 0.3, 0.4],   # q0: first match at rank 0
        [0.4, 0.3, 0.2, 0.1],   # q1: order g3,g2,g1,g0
    ])
    q_ids = np.array([1, 2])
    g_ids = np.array([1, 9, 9, 2])
    q_cams = np.array([0, 0])
    g_cams = np.array([1, 1, 1, 1])
    scores = metrics.cmc(dist, q_ids, g_ids, q_cams, g_cams, topk=4,
                         separate_camera_set=False,
                         single_gallery_shot=False, first_match_break=True)
    # q0 matches at rank 0; q1's g3 (id 2) is its rank-0 too
    np.testing.assert_allclose(scores, [1.0, 1.0, 1.0, 1.0])


def test_cmc_excludes_same_id_same_cam():
    dist = np.array([[0.1, 0.2]])
    q_ids, g_ids = np.array([1]), np.array([1, 1])
    q_cams, g_cams = np.array([0]), np.array([0, 1])  # g0 same cam: excluded
    scores = metrics.cmc(dist, q_ids, g_ids, q_cams, g_cams, topk=2,
                         first_match_break=True)
    np.testing.assert_allclose(scores, [1.0, 1.0])


def test_mean_ap_excludes_same_id_same_cam():
    dist = np.array([[0.1, 0.2, 0.3]])
    q_ids, g_ids = np.array([1]), np.array([1, 9, 1])
    q_cams, g_cams = np.array([0]), np.array([0, 1, 1])
    # valid gallery after exclusion: g1 (neg), g2 (pos) -> AP of [0, 1]
    m_ap = metrics.mean_ap(dist, q_ids, g_ids, q_cams, g_cams)
    y_true, y_score = np.array([0, 1]), np.array([-0.2, -0.3])
    want = metrics.average_precision_v0_18(y_true, y_score)
    np.testing.assert_allclose(m_ap, want)


def _clustered_features(rng, n_ids, per_id, dim=32, noise=0.05):
    centers = rng.randn(n_ids, dim)
    feats, ids = [], []
    for i in range(n_ids):
        feats.append(centers[i] + noise * rng.randn(per_id, dim))
        ids.extend([i + 1] * per_id)
    f = np.concatenate(feats).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    return f, np.array(ids)


def test_evaluate_end_to_end_synthetic(rng_np, capsys):
    n_ids, per_id = 8, 6
    feat, ids = _clustered_features(rng_np, n_ids, per_id)
    cams = np.tile(np.arange(per_id) % 3, n_ids)
    # first image of each id is the query, rest gallery
    marks = np.ones(len(ids), np.int64)
    marks[::per_id] = 0
    results = evaluate(feat, ids, cams, marks, to_re_rank=True)
    captured = capsys.readouterr().out
    assert 'Single Query:' in captured and '[mAP:' in captured
    assert 'Re-ranked Single Query:' in captured
    m_ap = results['single']['mAP']
    cmc_scores = results['single']['cmc']
    assert m_ap > 0.9          # well-separated clusters
    assert cmc_scores[0] > 0.9
    assert 'single_rerank' in results


def test_rerank_jax_matches_numpy(rng_np):
    import jax
    feat, ids = _clustered_features(rng_np, 6, 5, dim=16, noise=0.3)
    nq = 6
    q, g = feat[:nq], feat[nq:]
    qg = metrics.compute_dist(q, g)
    qq = metrics.compute_dist(q, q)
    gg = metrics.compute_dist(g, g)
    want = re_ranking(qg, qq, gg, k1=5, k2=3)
    got = np.asarray(rerank_distmat_jax(qg, qq, gg, k1=5, k2=3))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rerank_jax_matches_numpy_default_params(rng_np):
    # reference hyperparams k1=20, k2=6 (reid_dataset_evaluator.py:442)
    # at a scale where the 2/3-overlap expansion genuinely fires, plus
    # the k2=1 no-expansion branch
    feat, ids = _clustered_features(rng_np, 30, 10, dim=24, noise=0.4)
    nq = 60
    q, g = feat[:nq], feat[nq:]
    qg = metrics.compute_dist(q, g)
    qq = metrics.compute_dist(q, q)
    gg = metrics.compute_dist(g, g)
    want = re_ranking(qg, qq, gg)
    got = np.asarray(rerank_distmat_jax(qg, qq, gg))
    np.testing.assert_allclose(got, want, atol=2e-4)
    want1 = re_ranking(qg, qq, gg, k2=1)
    got1 = np.asarray(rerank_distmat_jax(qg, qq, gg, k2=1))
    np.testing.assert_allclose(got1, want1, atol=2e-4)


def test_rerank_jax_tiny_set_and_large_k2(rng_np):
    """Regression: (a) sets smaller than k1+1 must not crash top_k (the
    numpy argsort slices clamp silently — default TPU eval on a smoke
    dataset); (b) k2 > k1+1 expands over the k2 nearest from the FULL
    rank, like numpy initial_rank[:, :k2]."""
    feat, ids = _clustered_features(rng_np, 4, 3, dim=8, noise=0.3)
    nq = 4
    q, g = feat[:nq], feat[nq:]
    qg = metrics.compute_dist(q, g)
    qq = metrics.compute_dist(q, q)
    gg = metrics.compute_dist(g, g)
    # 12 total images < k1+1=21
    want = re_ranking(qg, qq, gg)
    got = np.asarray(rerank_distmat_jax(qg, qq, gg))
    np.testing.assert_allclose(got, want, atol=2e-4)

    feat, ids = _clustered_features(rng_np, 12, 6, dim=16, noise=0.35)
    nq = 12
    q, g = feat[:nq], feat[nq:]
    qg = metrics.compute_dist(q, g)
    qq = metrics.compute_dist(q, q)
    gg = metrics.compute_dist(g, g)
    want = re_ranking(qg, qq, gg, k1=5, k2=10)
    got = np.asarray(rerank_distmat_jax(qg, qq, gg, k1=5, k2=10))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rerank_jax_empty_reciprocal_set_stays_finite(rng_np):
    """Regression: with more than k1+1 exact-duplicate feature rows, the
    index tie-break can leave a high-index duplicate out of every
    neighbor's top-k1 list, so its k-reciprocal set is EMPTY.  The numpy
    golden path leaves that V row all-zero (empty-assignment no-op); the
    device path used to emit 0/0 = NaN and poison the whole blend."""
    feat, _ = _clustered_features(rng_np, 6, 5, dim=16, noise=0.3)
    # 10 identical rows > k1+1 = 6 for k1=5; put them across the q/g split
    feat[2:12] = feat[2]
    nq = 8
    q, g = feat[:nq], feat[nq:]
    qg = metrics.compute_dist(q, g)
    qq = metrics.compute_dist(q, q)
    gg = metrics.compute_dist(g, g)
    want = re_ranking(qg, qq, gg, k1=5, k2=3)
    got = np.asarray(rerank_distmat_jax(qg, qq, gg, k1=5, k2=3))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_parse_im_name():
    assert parse_im_name('00000042_0003_00000007.jpg', 'id') == 42
    assert parse_im_name('00000042_0003_00000007.jpg', 'cam') == 3


def test_multi_query_pooling(rng_np, capsys):
    feat, ids = _clustered_features(rng_np, 4, 8)
    cams = np.tile(np.arange(8) % 2, 4)
    marks = np.ones(len(ids), np.int64)
    marks[::8] = 0    # queries
    marks[1::8] = 2   # multi-query extras
    marks[2::8] = 2
    results = evaluate(feat, ids, cams, marks, to_re_rank=False)
    assert 'multi' in results
    assert 'Multi Query:' in capsys.readouterr().out


def test_visualize_rank_lists(tmp_path):
    """REID.VIS grids: one canvas per query, query + top-k gallery tiles,
    written under output_dir (reference reid_dataset_evaluator.py:522-591)."""
    import pytest
    cv2 = pytest.importorskip('cv2')
    from pps_tpu.evaluation.visualize import visualize_rank_lists

    rng = np.random.RandomState(0)
    h, w = 48, 24
    qdir = tmp_path / 'q'
    gdir = tmp_path / 'g'
    qdir.mkdir()
    gdir.mkdir()
    q_paths, g_paths = [], []
    for i in range(3):
        p = str(qdir / ('%08d_0001_%08d.png' % (i + 1, i + 1)))
        cv2.imwrite(p, rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        q_paths.append(p)
    for j in range(8):
        p = str(gdir / ('%08d_0002_%08d.png' % (j % 3 + 1, 100 + j)))
        cv2.imwrite(p, rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        g_paths.append(p)
    q_ids = np.array([1, 2, 3])
    g_ids = np.array([j % 3 + 1 for j in range(8)])
    q_cams = np.ones(3, int)
    g_cams = np.full(8, 2)
    dm = rng.rand(3, 8)

    out = str(tmp_path / 'vis')
    visualize_rank_lists(dm, q_ids, g_ids, q_cams, g_cams,
                         q_paths, g_paths, out, topk=5)
    written = sorted(os.listdir(out))
    assert len(written) == 3
    im = cv2.imread(os.path.join(out, written[0]))
    assert im is not None and im.shape[0] == h + 8  # 2*border
    assert im.shape[1] > w * 5  # query + tiles
