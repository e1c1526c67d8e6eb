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
