"""On-device CMC/mAP: the full retrieval evaluation as jitted XLA.

The reference evaluates in numpy with per-query Python loops
(reference reid_dataset_evaluator.py:283-439); at gallery scale the
argsort + AP loop dominates eval wall-clock.  Here the Market-1501
protocol (separate_camera_set=False, single_gallery_shot=False,
first_match_break=True — reference :34-37) and the pinned sklearn-0.18.1
trapezoidal AP are vectorized over queries and run on the TPU.

Exclusion trick: same-id-same-cam gallery entries are pushed to +inf
distance, which preserves the relative order of the valid entries under a
stable argsort while keeping every row a fixed [Ng] vector (static shapes).

Numerics note: the 0.18.1 AP places thresholds at *distinct* score values;
this vectorization assumes distinct distances within a query row (float
embedding distances; exact ties have measure zero).  The numpy
implementation in metrics.py remains the golden reference and the two are
cross-checked in tests/test_device_eval.py.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('topk',))
def cmc_map_device(distmat, query_ids, gallery_ids, query_cams,
                   gallery_cams, topk=10):
    """Returns (mAP scalar, cmc [topk]) under the Market-1501 protocol."""
    distmat = jnp.asarray(distmat, jnp.float32)
    nq, ng = distmat.shape
    q_ids = jnp.asarray(query_ids)[:, None]
    q_cams = jnp.asarray(query_cams)[:, None]
    g_ids = jnp.asarray(gallery_ids)[None, :]
    g_cams = jnp.asarray(gallery_cams)[None, :]

    excluded = (g_ids == q_ids) & (g_cams == q_cams)
    d = jnp.where(excluded, jnp.inf, distmat)
    order = jnp.argsort(d, axis=1, stable=True)

    match = jnp.take_along_axis(
        jnp.broadcast_to(g_ids, (nq, ng)), order, axis=1) == q_ids
    n_valid = jnp.sum(~excluded, axis=1)
    pos = jnp.arange(ng)[None, :]
    match = match & (pos < n_valid[:, None])
    match_f = match.astype(jnp.float32)

    total = jnp.sum(match_f, axis=1)                     # matches per query
    valid_q = total > 0

    # --- mAP: trapezoid of precision over recall, (r=0, p=1) endpoint ---
    tps = jnp.cumsum(match_f, axis=1)
    prec = tps / (pos + 1.0)
    prec_prev = jnp.concatenate(
        [jnp.ones((nq, 1), jnp.float32), prec[:, :-1]], axis=1)
    ap = jnp.sum(match_f * (prec + prec_prev), axis=1) / (
        2.0 * jnp.maximum(total, 1.0))
    m_ap = jnp.sum(jnp.where(valid_q, ap, 0.0)) / jnp.maximum(
        jnp.sum(valid_q), 1)

    # --- CMC (first_match_break): rank of the first valid match ---
    first_rank = jnp.argmax(match, axis=1)               # 0 if no match
    ks = jnp.arange(topk)[None, :]
    hits = (first_rank[:, None] <= ks) & valid_q[:, None]
    cmc = jnp.sum(hits.astype(jnp.float32), axis=0) / jnp.maximum(
        jnp.sum(valid_q), 1)
    return m_ap, cmc


def evaluate_on_device(feat, ids, cams, marks, distmat_fn=None, topk=10):
    """Single-query mAP/CMC fully on device: distmat + metrics in one jit.

    feat/ids/cams/marks as in evaluator.evaluate.  Returns
    {'mAP': float, 'cmc': np.ndarray[topk]}.
    """
    import numpy as np
    from pps_tpu.ops.distance import euclidean_distmat
    feat = jnp.asarray(feat)
    ids = np.asarray(ids)
    cams = np.asarray(cams)
    marks = np.asarray(marks)
    q = marks == 0
    g = marks == 1
    dist_fn = distmat_fn or euclidean_distmat
    dm = dist_fn(feat[q], feat[g])
    m_ap, cmc = cmc_map_device(dm, ids[q], ids[g], cams[q], cams[g],
                               topk=topk)
    return {'mAP': float(m_ap), 'cmc': np.asarray(cmc)}
