"""On-device CMC/mAP vs the numpy golden implementation."""

import numpy as np
import pytest

from pps_tpu.evaluation import metrics
from pps_tpu.evaluation.device_eval import cmc_map_device, evaluate_on_device


def _synthetic(seed, nq=40, ng=200, n_ids=15, n_cams=4, d=32, sep=1.0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_ids, d) * sep
    q_ids = rng.randint(0, n_ids, nq)
    g_ids = rng.randint(0, n_ids, ng)
    q_cams = rng.randint(0, n_cams, nq)
    g_cams = rng.randint(0, n_cams, ng)
    qf = centers[q_ids] + rng.randn(nq, d)
    gf = centers[g_ids] + rng.randn(ng, d)
    dist = metrics.compute_dist(qf.astype(np.float32),
                                gf.astype(np.float32))
    return dist, q_ids, g_ids, q_cams, g_cams


@pytest.mark.parametrize('seed,sep', [(0, 1.0), (1, 3.0), (2, 0.2)])
def test_device_matches_numpy(seed, sep):
    dist, q_ids, g_ids, q_cams, g_cams = _synthetic(seed, sep=sep)
    want_map = metrics.mean_ap(dist, q_ids, g_ids, q_cams, g_cams)
    want_cmc = metrics.cmc(dist, q_ids, g_ids, q_cams, g_cams, topk=10,
                           separate_camera_set=False,
                           single_gallery_shot=False,
                           first_match_break=True)
    got_map, got_cmc = cmc_map_device(dist, q_ids, g_ids, q_cams, g_cams,
                                      topk=10)
    np.testing.assert_allclose(float(got_map), want_map, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cmc), want_cmc, rtol=1e-6,
                               atol=1e-6)


def test_device_eval_valid_inf_distance_not_excluded():
    """A VALID gallery entry carrying +inf distance (e.g. a masking
    distmat_fn) must stay inside the scored prefix; previously it could
    tie into the excluded +inf group and let an excluded same-id-same-cam
    entry slip into the cutoff as a counted match."""
    # q0: gallery = [valid id1 inf, excluded id1 cam1, valid id2 0.5]
    dist = np.array([[np.inf, 0.0, 0.5]], np.float32)
    q_ids = np.array([1])
    g_ids = np.array([1, 1, 2])
    q_cams = np.array([1])
    g_cams = np.array([2, 1, 2])
    want_map = metrics.mean_ap(dist, q_ids, g_ids, q_cams, g_cams)
    want_cmc = metrics.cmc(dist, q_ids, g_ids, q_cams, g_cams, topk=2,
                           separate_camera_set=False,
                           single_gallery_shot=False,
                           first_match_break=True)
    got_map, got_cmc = cmc_map_device(dist, q_ids, g_ids, q_cams, g_cams,
                                      topk=2)
    np.testing.assert_allclose(float(got_map), want_map, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cmc), want_cmc, rtol=1e-6,
                               atol=1e-6)


def test_device_eval_with_invalid_queries():
    # a query whose only same-id entries share its camera (all excluded)
    dist = np.array([[0.1, 0.2, 0.3],
                     [0.3, 0.2, 0.1]], np.float32)
    q_ids = np.array([1, 2])
    g_ids = np.array([1, 3, 4])
    q_cams = np.array([0, 0])
    g_cams = np.array([0, 1, 1])  # query 0's match is same-cam -> excluded
    g_ids2 = np.array([1, 2, 4])  # query 1 now has a valid match
    want_map = metrics.mean_ap(dist, q_ids, g_ids2, q_cams, g_cams)
    want_cmc = metrics.cmc(dist, q_ids, g_ids2, q_cams, g_cams, topk=3,
                           first_match_break=True)
    got_map, got_cmc = cmc_map_device(dist, q_ids, g_ids2, q_cams, g_cams,
                                      topk=3)
    np.testing.assert_allclose(float(got_map), want_map, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cmc), want_cmc, rtol=1e-6)


def test_evaluate_on_device_end_to_end():
    rng = np.random.RandomState(3)
    n_ids = 8
    centers = rng.randn(n_ids, 16) * 3
    ids, cams, marks, feats = [], [], [], []
    for pid in range(n_ids):
        for j in range(6):
            ids.append(pid)
            cams.append(j % 3)
            marks.append(0 if j == 0 else 1)
            feats.append(centers[pid] + rng.randn(16) * 0.3)
    feats = np.stack(feats).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    res = evaluate_on_device(feats, np.array(ids), np.array(cams),
                             np.array(marks))
    assert res['mAP'] > 0.8
    assert res['cmc'][0] > 0.8
    # cross-check vs numpy evaluator
    from pps_tpu.evaluation.evaluator import evaluate
    ref = evaluate(feats, np.array(ids), np.array(cams), np.array(marks))
    np.testing.assert_allclose(res['mAP'], ref['single']['mAP'], rtol=1e-5)
    np.testing.assert_allclose(res['cmc'][0], ref['single']['cmc1'],
                               rtol=1e-6)


def test_evaluate_device_single_query_flag():
    """evaluator.evaluate(device_single_query=True) — the default TPU eval
    path (engine/test.py) — matches the numpy path for all result blocks,
    including re-ranked (which must recompute the host distmat the device
    path skipped)."""
    rng = np.random.RandomState(7)
    n_ids = 6
    centers = rng.randn(n_ids, 12) * 3
    ids, cams, marks, feats = [], [], [], []
    for pid in range(n_ids):
        for j in range(8):
            ids.append(pid)
            cams.append(j % 3)
            # 0=query, 1=gallery, 2=multi-query
            marks.append(0 if j == 0 else (2 if j >= 6 else 1))
            feats.append(centers[pid] + rng.randn(12) * 0.4)
    feats = np.stack(feats).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    ids, cams, marks = map(np.array, (ids, cams, marks))

    from pps_tpu.evaluation.evaluator import evaluate
    ref = evaluate(feats, ids, cams, marks, to_re_rank=True)
    dev = evaluate(feats, ids, cams, marks, to_re_rank=True,
                   device_single_query=True)
    for block in ('single', 'multi', 'single_rerank', 'multi_rerank'):
        assert block in dev and block in ref
        np.testing.assert_allclose(dev[block]['mAP'], ref[block]['mAP'],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(dev[block]['cmc1'], ref[block]['cmc1'],
                                   rtol=1e-6)


def test_device_exact_under_ties():
    """Structurally tied distances (duplicated gallery features and a
    jaccard-style distmat with repeated values): device mAP/CMC equal the
    numpy golden path exactly — the device AP collapses tie groups to one
    threshold (0.18.1 distinct-score semantics) and both paths break CMC
    ties by stable sort order."""
    rng = np.random.RandomState(7)
    n_ids, per_id, d = 6, 5, 8
    ids = np.repeat(np.arange(n_ids), per_id)
    cams = rng.randint(0, 3, ids.size)
    centers = rng.randn(n_ids, d)
    feat = (centers[ids] + 0.5 * rng.randn(ids.size, d)).astype(np.float32)
    q = np.zeros(ids.size, bool)
    q[::per_id] = True
    g_feat = feat[~q].copy()
    # duplicate half the gallery rows -> exact zero-distance ties and
    # duplicated distance columns
    g_feat[1::2] = g_feat[0::2]
    g_ids = ids[~q].copy()
    g_cams = cams[~q].copy()
    dm = metrics.compute_dist(feat[q], g_feat)
    # quantize so unrelated entries also tie (worst case for grouping)
    dm = np.round(dm, 1)

    m_np = metrics.mean_ap(dm, ids[q], g_ids, cams[q], g_cams)
    c_np = metrics.cmc(dm, ids[q], g_ids, cams[q], g_cams, topk=10,
                       separate_camera_set=False,
                       single_gallery_shot=False, first_match_break=True)
    m_dev, c_dev = cmc_map_device(dm, ids[q], g_ids, cams[q], g_cams,
                                  topk=10)
    np.testing.assert_allclose(float(m_dev), m_np, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(c_dev), c_np, rtol=1e-6)


def test_device_ap_tie_group_hand_case():
    """Hand-checked tie group: distances [1,1,2,2,3] with matches at
    positions 0,2,3 -> thresholds at ends of the tie runs."""
    dm = np.array([[1.0, 1.0, 2.0, 2.0, 3.0]])
    g_ids = np.array([5, 9, 5, 5, 9])
    q_ids = np.array([5])
    cams_q = np.array([0])
    cams_g = np.array([1, 1, 1, 1, 1])
    # thresholds: idx1 (tps=1, p=1/2, r=1/3), idx3 (tps=3, p=3/4, r=1),
    # idx4 (zero-width).  AP = (1/3)(1+.5)/2 + (2/3)(.5+.75)/2 = 2/3
    want = (1/3) * (1 + 0.5) / 2 + (2/3) * (0.5 + 0.75) / 2
    m_np = metrics.mean_ap(dm, q_ids, g_ids, cams_q, cams_g)
    m_dev, _ = cmc_map_device(dm, q_ids, g_ids, cams_q, cams_g, topk=5)
    np.testing.assert_allclose(m_np, want, rtol=1e-9)
    np.testing.assert_allclose(float(m_dev), want, rtol=1e-6)


def test_device_rerank_block_with_tied_features():
    """End-to-end evaluator with duplicated features through the
    device-scored re-ranked block (jaccard distances tie structurally
    when k-reciprocal sets coincide): device vs numpy at fp tolerance."""
    rng = np.random.RandomState(11)
    n_ids, per_id, d = 5, 6, 10
    ids = np.repeat(np.arange(n_ids), per_id)
    cams = np.arange(ids.size) % 3
    centers = rng.randn(n_ids, d)
    feat = (centers[ids] + 0.6 * rng.randn(ids.size, d)).astype(np.float32)
    # duplicate pairs of images -> identical k-reciprocal neighborhoods
    feat[1::3] = feat[0::3]
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    marks = np.where(np.arange(ids.size) % per_id == 0, 0, 1)

    from pps_tpu.evaluation.evaluator import evaluate
    ref = evaluate(feat, ids, cams, marks, to_re_rank=True)
    dev = evaluate(feat, ids, cams, marks, to_re_rank=True,
                   device_single_query=True, device_rerank=True)
    for block in ('single', 'single_rerank'):
        np.testing.assert_allclose(dev[block]['mAP'], ref[block]['mAP'],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(dev[block]['cmc1'], ref[block]['cmc1'],
                                   rtol=1e-5, atol=1e-6)
