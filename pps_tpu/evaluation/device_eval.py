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

Numerics note: the 0.18.1 AP places thresholds at *distinct* score
values.  The vectorized AP below collapses tie groups to one threshold
(cummin/cummax group propagation), so it matches the host path exactly
even for distmats with structural ties — re-ranked/jaccard distances can
tie when two gallery entries share a k-reciprocal neighborhood
(evaluator.py:154-166), and duplicated features tie trivially.  CMC
breaks ties by stable sort order, shared with the host path
(metrics.py uses mergesort).  The numpy implementation in metrics.py
remains the golden reference; tie cases are cross-checked in
tests/test_device_eval.py.
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
    # the exclusion mechanism NEEDS +inf to be reserved for excluded
    # entries: a VALID +inf/nan distance would tie into the excluded
    # group where stable sort can place an excluded entry inside the
    # pos < n_valid cutoff and score it.  Clamp valid distances finite
    # first (order among them is unchanged — all clamped entries tie).
    big = jnp.float32(3.0e38)
    d = jnp.clip(jnp.nan_to_num(distmat, nan=big, posinf=big,
                                neginf=-big), -big, big)
    d = jnp.where(excluded, jnp.inf, d)
    order = jnp.argsort(d, axis=1, stable=True)

    match = jnp.take_along_axis(
        jnp.broadcast_to(g_ids, (nq, ng)), order, axis=1) == q_ids
    n_valid = jnp.sum(~excluded, axis=1)
    pos = jnp.arange(ng)[None, :]
    match = match & (pos < n_valid[:, None])
    match_f = match.astype(jnp.float32)

    total = jnp.sum(match_f, axis=1)                     # matches per query
    valid_q = total > 0

    # --- mAP: trapezoid of precision over recall, (r=0, p=1) endpoint,
    # thresholds at DISTINCT distance values (the 0.18.1 semantics).
    # Tied distances share one threshold, so tie groups are collapsed:
    # every position gathers the cumulative tps at its group END (the
    # group's precision point) and the previous group's end (the prior
    # trapezoid vertex).  Order within a tie group cancels out, which is
    # what makes this agree with the host path even though host argsort
    # and device argsort could break ties differently. ---
    d_sorted = jnp.take_along_axis(d, order, axis=1)
    nxt = jnp.concatenate(
        [d_sorted[:, 1:], jnp.full((nq, 1), jnp.inf, d_sorted.dtype)],
        axis=1)
    is_end = (d_sorted != nxt) | (pos == ng - 1)
    # L[i] = end index of i's tie group: backward min-propagation of the
    # end positions (excluded entries sit in one +inf group at the tail
    # where match is all-zero, so they never contribute)
    big = jnp.where(is_end, pos, ng)
    L = jnp.flip(jax.lax.cummin(jnp.flip(big, axis=1), axis=1), axis=1)
    # S[i] = start index of i's tie group: forward max-propagation
    is_start = jnp.concatenate(
        [jnp.ones((nq, 1), bool), is_end[:, :-1]], axis=1)
    S = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=1)

    tps = jnp.cumsum(match_f, axis=1)
    t_end = jnp.take_along_axis(tps, L, axis=1)
    p_end = t_end / (L + 1.0)
    t_prev = jnp.take_along_axis(tps, jnp.maximum(S - 1, 0), axis=1)
    p_prev = jnp.where(S == 0, 1.0, t_prev / jnp.maximum(S, 1))
    ap = jnp.sum(match_f * (p_end + p_prev), axis=1) / (
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
