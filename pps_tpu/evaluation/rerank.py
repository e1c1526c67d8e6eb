"""k-reciprocal re-ranking (Zhong et al., CVPR 2017).

Fresh implementation of the algorithm used by the reference
(/root/reference/detectron/datasets/reid_dataset_evaluator.py:442-519) with
identical numerics but vectorized set logic:

1. squared distances, column-max normalized, transposed
2. k-reciprocal neighbor sets R(i, k1) with the 2/3-overlap expansion
3. gaussian-weighted sparse membership vectors V, L1-normalized
4. local query expansion: V <- mean of V over the k2 nearest neighbors
5. jaccard distance from the inverted index; blend with original dist

Default hyperparameters k1=20, k2=6, lambda=0.3 match the reference.

``rerank_distmat_jax`` provides the on-device formulation (SURVEY.md
section 5, long-context analog): the k-reciprocal sets stay *sparse* —
padded [N, k] index lists from top-k, reciprocity checked by gather —
and only the membership-weight matrix V is dense, built row-block by
row-block with scatter.  Peak residency is ~3 [N, N] f32 buffers, so
full Market scale (19,281 images) fits a 16 GB chip.
"""

import functools

import numpy as np


def _k_reciprocal_neighbors(initial_rank, i, k):
    forward = initial_rank[i, :k + 1]
    backward = initial_rank[forward, :k + 1]
    rows = np.where(backward == i)[0]
    return forward[rows]


def re_ranking(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6, lambda_value=0.3):
    """Numpy golden implementation; returns the re-ranked [Nq, Ng] distmat."""
    query_num = q_g_dist.shape[0]
    all_num = query_num + q_g_dist.shape[1]

    original_dist = np.concatenate([
        np.concatenate([q_q_dist, q_g_dist], axis=1),
        np.concatenate([q_g_dist.T, g_g_dist], axis=1),
    ], axis=0)
    original_dist = np.power(original_dist, 2).astype(np.float32)
    original_dist = np.transpose(
        original_dist / np.max(original_dist, axis=0))
    initial_rank = np.argsort(original_dist).astype(np.int32)

    V = np.zeros_like(original_dist, dtype=np.float32)
    half_k1 = int(np.around(k1 / 2.0))
    for i in range(all_num):
        base = _k_reciprocal_neighbors(initial_rank, i, k1)
        expansion = base
        for candidate in base:
            cand_set = _k_reciprocal_neighbors(initial_rank, candidate,
                                               half_k1)
            if len(np.intersect1d(cand_set, base)) > (2.0 / 3) * len(
                    cand_set):
                expansion = np.append(expansion, cand_set)
        expansion = np.unique(expansion)
        weight = np.exp(-original_dist[i, expansion])
        V[i, expansion] = weight / np.sum(weight)

    original_dist = original_dist[:query_num]
    if k2 != 1:
        V = np.mean(V[initial_rank[:, :k2], :], axis=1)

    inv_index = [np.where(V[:, g] != 0)[0] for g in range(all_num)]

    jaccard_dist = np.zeros_like(original_dist, dtype=np.float32)
    for i in range(query_num):
        temp_min = np.zeros((all_num,), dtype=np.float32)
        nonzero = np.where(V[i, :] != 0)[0]
        for j in nonzero:
            rows = inv_index[j]
            temp_min[rows] += np.minimum(V[i, j], V[rows, j])
        jaccard_dist[i] = 1 - temp_min / (2.0 - temp_min)

    final = jaccard_dist * (1 - lambda_value) + original_dist * lambda_value
    return final[:, query_num:]


@functools.lru_cache(maxsize=8)
def _rerank_stages(n, query_num, k1, k2, lambda_value):
    """Jitted pipeline stages for rerank_distmat_jax, cached per shape.

    Everything data-dependent in the reference loops
    (reid_dataset_evaluator.py:461-511) becomes fixed-shape sparse sets:
    the k-reciprocal set of a row is at most k1+1 indices, its 2/3-overlap
    expansion at most (k1+1)*(half_k1+1) more, and after the k2 local
    query expansion a query row of V has at most S = k2*(k1+1)*(half_k1+2)
    nonzeros — so padded index lists + validity masks cover the exact
    algorithm with no silent truncation.
    """
    import jax
    import jax.numpy as jnp

    half = int(np.around(k1 / 2.0))
    # clamp the neighborhood sizes to the set size (the numpy reference's
    # initial_rank[:, :k] slices clamp silently on tiny sets; top_k would
    # raise instead) and rank enough columns for BOTH the k-reciprocal
    # sets and the k2 local-query expansion (k2 may exceed k1+1)
    k1p = min(k1 + 1, n)
    hp = min(half + 1, k1p)
    k2c = min(k2, n)
    kmax = max(k1p, k2c)
    s0 = k1p + k1p * hp               # max expansion-set slots per row
    s_q = min(n, s0 * k2c)

    @jax.jit
    def build_od(qg, qq, gg):
        top = jnp.concatenate([qq, qg], axis=1)
        bottom = jnp.concatenate([qg.T, gg], axis=1)
        od = jnp.concatenate([top, bottom], axis=0)
        od = jnp.square(od.astype(jnp.float32))
        return (od / jnp.max(od, axis=0)).T

    @jax.jit
    def neighbor_sets(od):
        # tk[i]: the kmax nearest rows (self included, ascending; the
        # initial_rank[:, :kmax] prefix of the reference argsort — kmax
        # covers both the k1+1 reciprocal prefix and the k2 expansion)
        _, tk = jax.lax.top_k(-od, kmax)
        tk = tk.astype(jnp.int32)

        def recip(k):
            fwd = tk[:, :k]                       # [N, k]
            back = tk[fwd, :k]                    # [N, k, k]
            i = jnp.arange(n, dtype=jnp.int32)[:, None, None]
            return jnp.any(back == i, axis=-1)    # [N, k]

        return tk, recip(k1p), recip(hp)

    @jax.jit
    def build_V(od, tk, base_valid, half_valid):
        base_idx = tk[:, :k1p]                     # [N, K1]
        half_idx = tk[:, :hp]                      # [N, H1]
        # candidate c = base_idx[i, s]; its half-k-reciprocal set is
        # accepted when |R(c, half) & R(i, k1)| > 2/3 |R(c, half)|
        ch_idx = half_idx[base_idx]                # [N, K1, H1]
        ch_val = half_valid[base_idx]              # [N, K1, H1]
        eq = ch_idx[:, :, :, None] == base_idx[:, None, None, :]
        in_base = jnp.any(eq & base_valid[:, None, None, :], axis=-1)
        overlap = jnp.sum(in_base & ch_val, axis=-1)          # [N, K1]
        sz = jnp.sum(ch_val, axis=-1)
        accept = base_valid & (overlap > (2.0 / 3.0) * sz)

        idx = jnp.concatenate([base_idx, ch_idx.reshape(n, -1)], axis=1)
        val = jnp.concatenate(
            [base_valid, (ch_val & accept[:, :, None]).reshape(n, -1)],
            axis=1)                                # [N, S0]

        def one_row(args):
            idx_i, val_i, od_i = args              # [S0] [S0] [N]
            w = jnp.where(val_i, jnp.exp(-od_i[idx_i]), 0.0)
            sidx = jnp.where(val_i, idx_i, n)      # dump invalid in col n
            # scatter-SET: duplicate j slots carry the identical weight
            # exp(-od[i, j]), so overwrites are harmless (the dense row
            # is the de-duplicated union, reference's np.unique analog)
            row = jnp.zeros((n + 1,), jnp.float32).at[sidx].set(w)[:n]
            # an all-invalid row (possible when > k1 exact-duplicate
            # feature rows tie-break a high-index sample out of every
            # neighbor list) must stay all-zero like the numpy golden
            # path's empty-set no-op, not become 0/0 = NaN
            s = jnp.sum(row)
            return row * jnp.where(s > 0, 1.0 / s, 0.0)

        return jax.lax.map(one_row, (idx, val, od),
                           batch_size=min(n, 1024))

    @jax.jit
    def expand_V(V, t2):
        # local query expansion: V <- mean of V over the k2 nearest rows
        def one_row(idx_i):                        # [k2]
            return jnp.mean(V[idx_i], axis=0)
        return jax.lax.map(one_row, t2, batch_size=min(n, 256))

    @jax.jit
    def jaccard_blend(Vq, Vt, od_q):
        # temp_min[i, g] = sum_j min(Vq[i, j], V[g, j]) over i's nonzero
        # support (<= s_q entries, gathered as rows of V^T — the dense
        # analog of the reference's inverted index)
        vals, idxs = jax.lax.top_k(Vq, s_q)        # [Nq, S]

        def one_query(args):
            v_i, j_i = args
            cols = Vt[j_i]                         # [S, N]
            mins = jnp.minimum(v_i[:, None], cols)
            mins = jnp.where((v_i > 0)[:, None], mins, 0.0)
            return jnp.sum(mins, axis=0)           # [N]

        temp_min = jax.lax.map(one_query, (vals, idxs),
                               batch_size=min(query_num, 16))
        jac = 1.0 - temp_min / (2.0 - temp_min)
        return jac * (1 - lambda_value) + od_q * lambda_value

    return build_od, neighbor_sets, build_V, expand_V, jaccard_blend


def rerank_distmat_jax(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6,
                       lambda_value=0.3):
    """On-device re-ranking at gallery scale (same math as `re_ranking`).

    Sparse-set formulation: per-row k-reciprocal sets are padded top-k
    index lists (reciprocity = one gather + compare), the 2/3-overlap
    expansion is a [N, k1+1, half+1, k1+1] compare-reduce, and V is built
    densely in row blocks by scatter.  Stages are jitted separately so
    at most ~3 [N, N] f32 buffers are live: 19,281 images (full Market)
    peak ~4.5 GB HBM and ~3.2 s on one v5e chip (~4 s including on-device
    distmats + mAP/CMC scoring of the result; the host C++/OpenMP path
    takes 14-25 s for the re-rank alone, numpy minutes).

    Matches the numpy golden path to float tolerance; entries can deviate
    where the k-th-neighbor distance is a near-tie (set membership flips
    under a 1-ulp od difference).  On clustered re-ID-like features this
    touches ~0.1% of entries (mean |diff| ~4e-6); the blended metrics are
    unaffected (tests + tools/bench_rerank.py cross-check).
    """
    import jax

    query_num = int(q_g_dist.shape[0])
    n = query_num + int(q_g_dist.shape[1])
    build_od, neighbor_sets, build_V, expand_V, jaccard_blend = \
        _rerank_stages(n, query_num, int(k1), int(k2), float(lambda_value))

    od = build_od(q_g_dist, q_q_dist, g_g_dist)
    tk, base_valid, half_valid = neighbor_sets(od)
    V = build_V(od, tk, base_valid, half_valid)
    od_q = jax.device_put(od[:query_num]).block_until_ready()
    del od
    if k2 != 1:
        V = expand_V(V, tk[:, :min(int(k2), n)])
    Vt = jax.jit(lambda v: v.T)(V)
    Vq = jax.device_put(V[:query_num]).block_until_ready()
    del V
    final = jaccard_blend(Vq, Vt, od_q)
    return final[:, query_num:]
