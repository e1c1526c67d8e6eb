"""C++ re-ranking vs the numpy golden implementation."""

import time

import numpy as np
import pytest

from pps_tpu import native
from pps_tpu.evaluation.rerank import re_ranking


def _dists(seed, nq=30, ng=120, d=24, n_ids=12):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_ids, d) * 2
    qf = centers[rng.randint(0, n_ids, nq)] + rng.randn(nq, d)
    gf = centers[rng.randint(0, n_ids, ng)] + rng.randn(ng, d)

    def dist(a, b):
        return np.sqrt(np.maximum(
            np.square(a).sum(1)[:, None] + np.square(b).sum(1)[None, :]
            - 2 * a @ b.T, 0)).astype(np.float32)
    return dist(qf, gf), dist(qf, qf), dist(gf, gf)


@pytest.mark.skipif(not native.available(), reason='g++ build unavailable')
@pytest.mark.parametrize('seed', [0, 1])
def test_native_matches_numpy(seed):
    qg, qq, gg = _dists(seed)
    want = re_ranking(qg, qq, gg)
    got = native.rerank_native(qg, qq, gg)
    assert got.shape == want.shape
    # identical algorithm; tiny float diffs from accumulation order
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not native.available(), reason='g++ build unavailable')
def test_native_rerank_hyperparams():
    qg, qq, gg = _dists(2)
    want = re_ranking(qg, qq, gg, k1=10, k2=3, lambda_value=0.5)
    got = native.rerank_native(qg, qq, gg, k1=10, k2=3, lambda_value=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_rerank_tiny_gallery():
    """Galleries smaller than k1=20 (k-reciprocal sets clamp to the whole
    set, like the reference's numpy slicing): no out-of-bounds, numerics
    match the numpy path.  Regression: the partial-rank rows used to be
    read past their stored width, segfaulting on tiny sets."""
    import numpy as np
    from pps_tpu import native
    import pytest
    if not native.available():
        pytest.skip('native rerank lib not built')
    from pps_tpu.evaluation.metrics import compute_dist
    from pps_tpu.evaluation.rerank import re_ranking
    for nq, ng in [(1, 2), (3, 5), (4, 8), (7, 19)]:
        rng = np.random.RandomState(nq * 100 + ng)
        f = rng.randn(nq + ng, 16).astype(np.float32)
        qg = compute_dist(f[:nq], f[nq:])
        qq = compute_dist(f[:nq], f[:nq])
        gg = compute_dist(f[nq:], f[nq:])
        np.testing.assert_allclose(native.rerank_native(qg, qq, gg),
                                   re_ranking(qg, qq, gg), atol=1e-5)
