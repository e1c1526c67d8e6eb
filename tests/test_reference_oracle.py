"""Oracle tests against the reference's OWN evaluator code.

The reference evaluator (/root/reference/detectron/datasets/
reid_dataset_evaluator.py) is pure numpy/sklearn for the functions under
test, but the module itself imports pycocotools + detectron.core.config,
so the oracle functions (`compute_dist`, `cmc`, `mean_ap`, `re_ranking`)
are extracted from the source via AST and exec'd into a minimal namespace.
This turns "we believe the numerics match" into "demonstrated against the
reference's own code" (VERDICT.md round-1 item #1):

  * compute_dist: bit-exact
  * cmc: bit-exact (Market protocol and separate_camera_set)
  * re_ranking: float tolerance (vectorized vs loop accumulation order)
  * mean_ap: characterizes the installed-sklearn delta; our pinned-0.18.1
    reimplementation stays within the published step-vs-trapezoid gap.
"""

import numpy as np
import pytest

from pps_tpu.evaluation.reference_oracle import (
    load_oracle, evaluate_with_oracle)


@pytest.fixture(scope='module')
def oracle():
    """The reference's pure-numpy oracle functions, exec'd from source
    (shared loader: pps_tpu/evaluation/reference_oracle.py)."""
    return load_oracle()


def _random_reid_problem(seed, n_ids=16, per_id=6, d=64):
    rng = np.random.RandomState(seed)
    n = n_ids * per_id
    ids = np.repeat(np.arange(n_ids), per_id)
    cams = rng.randint(0, 4, size=n)
    # clustered features so the retrieval problem is non-trivial
    centers = rng.randn(n_ids, d)
    feat = centers[ids] + 0.8 * rng.randn(n, d)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    # queries: first 2 images of each id; gallery: the rest
    q = np.zeros(n, bool)
    q[np.concatenate([np.where(ids == i)[0][:2] for i in range(n_ids)])] = 1
    return feat.astype(np.float32), ids, cams, q


def test_compute_dist_bit_exact(oracle):
    from pps_tpu.evaluation.metrics import compute_dist
    feat, ids, cams, q = _random_reid_problem(0)
    np.testing.assert_array_equal(
        compute_dist(feat[q], feat[~q], 'euclidean'),
        oracle['compute_dist'](feat[q], feat[~q], 'euclidean'))
    # cosine: sklearn.preprocessing.normalize rounds differently from the
    # manual norm divide; equal to float32 ulp noise only
    np.testing.assert_allclose(
        compute_dist(feat[q], feat[~q], 'cosine'),
        oracle['compute_dist'](feat[q], feat[~q], 'cosine'), atol=1e-6)


@pytest.mark.parametrize('sep_cam,fmb', [(False, True),   # Market protocol
                                         (False, False),
                                         (True, True)])
def test_cmc_bit_exact(oracle, sep_cam, fmb):
    from pps_tpu.evaluation.metrics import cmc, compute_dist
    feat, ids, cams, q = _random_reid_problem(1)
    dm = compute_dist(feat[q], feat[~q])
    kw = dict(topk=10, separate_camera_set=sep_cam,
              single_gallery_shot=False, first_match_break=fmb)
    ours = cmc(dm, ids[q], ids[~q], cams[q], cams[~q], **kw)
    ref = oracle['cmc'](dm, ids[q], ids[~q], cams[q], cams[~q], **kw)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize('fmb', [False, True])
def test_cmc_single_gallery_shot_bit_exact(oracle, fmb):
    """CUHK03 protocol: one random gallery instance per id, 100 draws.

    The sampler consumes numpy's GLOBAL RNG (one np.random.choice per id
    group, in first-appearance-in-rank order — reference
    reid_dataset_evaluator.py:327-352), so seeding identically before
    each call must give bit-identical curves.  This pins our restructured
    sampler (_sample_one_per_id/_rank_credit) to the reference's draw
    sequence, including the fmb quirk where the break path credits an
    unscaled 1.0 per draw."""
    from pps_tpu.evaluation.metrics import cmc, compute_dist
    feat, ids, cams, q = _random_reid_problem(6)
    dm = compute_dist(feat[q], feat[~q])
    kw = dict(topk=10, separate_camera_set=True,
              single_gallery_shot=True, first_match_break=fmb)
    np.random.seed(94)
    ours = cmc(dm, ids[q], ids[~q], cams[q], cams[~q], **kw)
    np.random.seed(94)
    ref = oracle['cmc'](dm, ids[q], ids[~q], cams[q], cams[~q], **kw)
    np.testing.assert_array_equal(ours, ref)


def test_cmc_per_query_bit_exact(oracle):
    from pps_tpu.evaluation.metrics import cmc, compute_dist
    feat, ids, cams, q = _random_reid_problem(2)
    dm = compute_dist(feat[q], feat[~q])
    kw = dict(topk=10, first_match_break=True, average=False)
    ours, ours_valid = cmc(dm, ids[q], ids[~q], cams[q], cams[~q], **kw)
    ref, ref_valid = oracle['cmc'](dm, ids[q], ids[~q], cams[q], cams[~q],
                                   **kw)
    np.testing.assert_array_equal(ours, ref)
    np.testing.assert_array_equal(ours_valid, ref_valid)


def test_re_ranking_matches_reference(oracle):
    from pps_tpu.evaluation.metrics import compute_dist
    from pps_tpu.evaluation.rerank import re_ranking
    feat, ids, cams, q = _random_reid_problem(3)
    qg = compute_dist(feat[q], feat[~q])
    qq = compute_dist(feat[q], feat[q])
    gg = compute_dist(feat[~q], feat[~q])
    ours = re_ranking(qg, qq, gg)
    ref = oracle['re_ranking'](qg, qq, gg)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_re_ranking_native_matches_reference(oracle):
    from pps_tpu import native
    if not native.available():
        pytest.skip('native rerank lib not built')
    from pps_tpu.evaluation.metrics import compute_dist
    feat, ids, cams, q = _random_reid_problem(4)
    qg = compute_dist(feat[q], feat[~q])
    qq = compute_dist(feat[q], feat[q])
    gg = compute_dist(feat[~q], feat[~q])
    ours = native.rerank_native(qg, qq, gg)
    ref = oracle['re_ranking'](qg, qq, gg)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_mean_ap_sklearn_delta_characterized(oracle):
    """Reference mean_ap under the INSTALLED sklearn uses step-function AP
    (>=0.19); our pinned-0.18.1 trapezoidal AP is the actual spec (the
    reference itself prints a warning on any sklearn != 0.18.1).  Assert
    (a) the two agree within the known step-vs-trapezoid gap and (b) our
    vectorized device evaluator agrees with our numpy evaluator far
    tighter than that gap, so ours is the internally consistent pair."""
    from pps_tpu.evaluation.metrics import compute_dist, mean_ap
    feat, ids, cams, q = _random_reid_problem(5)
    dm = compute_dist(feat[q], feat[~q])
    ours = mean_ap(dm, ids[q], ids[~q], cams[q], cams[~q])
    ref_installed = oracle['mean_ap'](dm, ids[q], ids[~q], cams[q],
                                      cams[~q])
    delta = abs(ours - ref_installed)
    # the trapezoid-vs-step AP difference is bounded by half the mean
    # per-threshold precision increment; on a ~100-gallery problem it is
    # small but nonzero.  Gate loosely and record.
    assert delta < 0.02, (ours, ref_installed)
    # b) device evaluator consistency (distinct-distance assumption)
    from pps_tpu.evaluation.device_eval import cmc_map_device
    m_ap_dev, _ = cmc_map_device(dm, ids[q], ids[~q], cams[q], cams[~q])
    assert abs(float(m_ap_dev) - ours) < 1e-5


def _random_marked_problem(seed, n_ids=12, per_id=8, d=48):
    """Full test-set layout: per id, 2 queries (mark 0), 2 multi-query
    extras (mark 2), rest gallery (mark 1)."""
    rng = np.random.RandomState(seed)
    n = n_ids * per_id
    ids = np.repeat(np.arange(1, n_ids + 1), per_id)
    cams = rng.randint(0, 4, size=n)
    centers = rng.randn(n_ids, d)
    feat = centers[ids - 1] + 0.7 * rng.randn(n, d)
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    j = np.tile(np.arange(per_id), n_ids)
    marks = np.where(j < 2, 0, np.where(j < 4, 2, 1))
    return feat.astype(np.float32), ids, cams, marks


def test_whole_evaluator_flow_oracle():
    """The FULL evaluation flow — mark splitting, Market protocol,
    multi-query pooling, re-rank blending — against the same flow
    composed purely from the reference's own exec'd functions
    (reference reid_dataset_evaluator.py:29-209), with the pinned-0.18.1
    AP in both so the comparison isolates the glue, not the known
    installed-sklearn AP delta."""
    from pps_tpu.evaluation.evaluator import evaluate

    feat, ids, cams, marks = _random_marked_problem(21)
    ref = evaluate_with_oracle(load_oracle(pinned_ap=True), feat, ids,
                               cams, marks, to_re_rank=True)
    ours = evaluate(feat, ids, cams, marks, to_re_rank=True)

    assert set(ref) == {'single', 'multi', 'single_rerank', 'multi_rerank'}
    for block in ref:
        assert block in ours, block
        np.testing.assert_allclose(
            ours[block]['mAP'], ref[block]['mAP'], rtol=1e-6, atol=1e-7,
            err_msg=block)
        np.testing.assert_allclose(
            ours[block]['cmc'], ref[block]['cmc'], rtol=1e-6, atol=1e-7,
            err_msg=block)


def test_whole_evaluator_flow_oracle_device_paths():
    """Same whole-flow oracle, but against the DEVICE-scored pipeline
    (device_eval + sparse-set device re-ranking) — the default TPU path
    in engine/test.py."""
    from pps_tpu.evaluation.evaluator import evaluate

    feat, ids, cams, marks = _random_marked_problem(22)
    ref = evaluate_with_oracle(load_oracle(pinned_ap=True), feat, ids,
                               cams, marks, to_re_rank=True)
    dev = evaluate(feat, ids, cams, marks, to_re_rank=True,
                   device_single_query=True, device_rerank=True)
    for block in ref:
        np.testing.assert_allclose(
            dev[block]['mAP'], ref[block]['mAP'], rtol=1e-5, atol=1e-6,
            err_msg=block)
        np.testing.assert_allclose(
            dev[block]['cmc'], ref[block]['cmc'], rtol=1e-5, atol=1e-6,
            err_msg=block)
