"""IVF (inverted-file) approximate retrieval: sub-linear gallery scan.

The reference's retrieval is a full numpy distance matrix
(reference reid_dataset_evaluator.py:104-125); our streaming/exact path
(`ops/topk.py`) already removes the O(Nq*Ng) memory, but every
query still READS the whole gallery — on a bandwidth-bound chip the scan
time is gallery-bytes / HBM-bandwidth (measured 5.6 s for 3368 queries x
1M x 3968-d int8 on v5e, ~4.9 ms/query single-query floor).  An IVF index
cuts the bytes: k-means the gallery into ``nlist`` cells, store rows
sorted by cell, and per query scan only the ``nprobe`` nearest cells —
bytes drop ~nlist/nprobe while recall stays high because re-ID embeddings
cluster by identity (the same structure k-reciprocal re-ranking exploits).

Everything is device math with static shapes:

* ``kmeans``            — chunked Lloyd iterations (assignment matmul +
                          one-hot matmul accumulation, MXU-friendly).
* ``assign_clusters``   — nearest-centroid ids for every row.
* ``build_ivf``         — host-side sort-by-cell: (perm, starts).
* ``ivf_topk``          — probe top-``nprobe`` cells, enumerate their rows
                          into a fixed ``budget`` of candidate slots
                          (vectorized searchsorted over the per-query cell
                          prefix sums), gather + exact distances + top-k.

Distances over gathered candidates use the same dequant + expand-form
math as ``streaming_topk``, so a candidate that IS in the probed cells
ranks identically to the exact scan (distances agree to matmul
reduction-order noise, ~1e-4); the only approximation is cell selection
(and budget truncation, see ``probe_totals``).

The gather duplicates rows across queries that probe overlapping cells,
so IVF wins for serving-scale query counts (1..a few hundred); bulk
offline eval over thousands of queries should keep using the exact
streaming scan, whose one pass over the gallery is shared by all queries.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _dequant_f32(rows, scale):
    """int8 rows + per-row scale -> f32 (None scale = already float)."""
    if scale is None:
        return rows.astype(jnp.float32)
    return rows.astype(jnp.float32) * scale[..., None]


def _chunked(g, g_scale, chunk):
    """Pad + reshape a gallery to [n_chunks, chunk, d] (+ scales, mask)."""
    ng, d = g.shape
    pad = (-ng) % chunk
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    n_chunks = gp.shape[0] // chunk
    gc = gp.reshape(n_chunks, chunk, d)
    sc = None
    if g_scale is not None:
        sc = jnp.pad(g_scale.astype(jnp.float32), (0, pad)).reshape(
            n_chunks, chunk)
    valid = (jnp.arange(n_chunks * chunk, dtype=jnp.int32) < ng).reshape(
        n_chunks, chunk)
    return gc, sc, valid


@jax.jit
def _lloyd_iter(gc, sc, valid, cent):
    """One Lloyd iteration over a chunk-reshaped gallery.

    Returns (new_centroids, counts).  Empty cells keep their previous
    centroid (the standard repair that avoids NaNs and dead-cell drift).
    """
    cn = jnp.sum(jnp.square(cent), axis=1)

    def body(carry, inp):
        sums, counts = carry
        gi, sci, vi = inp
        x = _dequant_f32(gi, sci)
        # argmin_c ||x - c||^2 == argmin_c (||c||^2 - 2 x.c)
        scores = cn[None, :] - 2.0 * jnp.dot(
            x, cent.T, preferred_element_type=jnp.float32)
        a = jnp.argmin(scores, axis=1)
        onehot = jax.nn.one_hot(a, cent.shape[0], dtype=jnp.float32)
        onehot = onehot * vi[:, None].astype(jnp.float32)
        sums = sums + jnp.dot(onehot.T, x,
                              preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), None

    init = (jnp.zeros(cent.shape, jnp.float32),
            jnp.zeros((cent.shape[0],), jnp.float32))
    (sums, counts), _ = jax.lax.scan(body, init, (gc, sc, valid))
    new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)
                    [:, None], cent)
    return new, counts


def kmeans(g, nlist, iters=10, seed=0, g_scale=None, sample=262144,
           chunk=65536):
    """K-means centroids of a gallery, computed on device.

    g: [N, d] float or int8 (with g_scale per-row dequant scales).
    sample: cap on rows used for training (None = all); clustering
    quality saturates well below 1M rows and the assignment matmul is
    the cost.  Returns centroids [nlist, d] f32 (device array).
    """
    ng = g.shape[0]
    rng = np.random.RandomState(seed)
    if sample is not None and ng > sample:
        take = np.sort(rng.choice(ng, size=sample, replace=False))
        gs = jnp.asarray(np.asarray(g)[take])
        ss = (None if g_scale is None
              else jnp.asarray(np.asarray(g_scale)[take]))
    else:
        gs, ss = jnp.asarray(g), (None if g_scale is None
                                  else jnp.asarray(g_scale))
    nlist = int(min(nlist, gs.shape[0]))
    init_rows = jnp.asarray(
        rng.choice(gs.shape[0], size=nlist, replace=False))
    cent = _dequant_f32(gs[init_rows],
                        None if ss is None else ss[init_rows])
    gc, sc, valid = _chunked(gs, ss, min(chunk, gs.shape[0]))
    for _ in range(int(iters)):
        cent, _ = _lloyd_iter(gc, sc, valid, cent)
    return cent


@jax.jit
def _assign_chunks(gc, sc, cent):
    cn = jnp.sum(jnp.square(cent), axis=1)

    def body(_, inp):
        gi, sci = inp
        x = _dequant_f32(gi, sci)
        scores = cn[None, :] - 2.0 * jnp.dot(
            x, cent.T, preferred_element_type=jnp.float32)
        return None, jnp.argmin(scores, axis=1).astype(jnp.int32)

    _, a = jax.lax.scan(body, None, (gc, sc))
    return a.reshape(-1)


def assign_clusters(g, cent, g_scale=None, chunk=65536):
    """Nearest-centroid id per gallery row -> [N] int32 (numpy)."""
    ng = g.shape[0]
    gc, sc, _ = _chunked(jnp.asarray(g),
                         None if g_scale is None else jnp.asarray(g_scale),
                         min(chunk, ng))
    return np.asarray(_assign_chunks(gc, sc, cent))[:ng]


def build_ivf(assign, nlist):
    """Host-side inverted file from per-row cell ids.

    Returns (perm [N] int32, starts [nlist+1] int32): ``perm`` lists
    original row ids sorted by cell (stable), ``starts[c]:starts[c+1]``
    is cell c's slice of the sorted layout.
    """
    assign = np.asarray(assign, np.int64)
    perm = np.argsort(assign, kind='stable').astype(np.int32)
    counts = np.bincount(assign, minlength=nlist)
    starts = np.zeros(nlist + 1, np.int32)
    np.cumsum(counts, out=starts[1:])
    return perm, starts


def probe_totals(q, cent, starts, nprobe):
    """Host diagnostic: candidate-row count per query at this nprobe
    (compare against the search budget to size truncation)."""
    q = jnp.asarray(q, jnp.float32)
    cn = jnp.sum(jnp.square(cent), axis=1)
    cd = cn[None, :] - 2.0 * q @ cent.T
    _, sel = jax.lax.top_k(-cd, min(nprobe, cent.shape[0]))
    sizes = jnp.asarray(starts)[sel + 1] - jnp.asarray(starts)[sel]
    return np.asarray(jnp.sum(sizes, axis=1))


@functools.partial(jax.jit,
                   static_argnames=('k', 'nprobe', 'budget', 'chunk',
                                    '_vary_axes'))
def ivf_topk(q, g, cent, starts, k, nprobe, budget, chunk=8192,
             g_scale=None, _vary_axes=None):
    """Top-k nearest gallery rows per query through the IVF index.

    q: [Nq, d] queries.  g / g_scale: the CELL-SORTED gallery (rows
    permuted by ``build_ivf``'s perm; int8 + scales or float).
    cent: [nlist, d] centroids.  starts: [nlist+1] cell offsets.
    budget: static cap on candidate rows per query; candidates beyond it
    (rare under a sane budget, see ``probe_totals``) are dropped from the
    LAST probed cells.  Memory is O(Nq * chunk * d) for the gather —
    callers with many queries should block them.

    Returns (dists [Nq, k], positions [Nq, k]) ascending; positions index
    the SORTED layout (map through perm for original ids); unfilled slots
    (fewer than k candidates) have distance +inf and position -1.
    """
    nq, d = q.shape
    nlist = cent.shape[0]
    nprobe = min(int(nprobe), nlist)
    q = q.astype(jnp.float32)
    qn = jnp.sum(jnp.square(q), axis=1, keepdims=True)

    cn = jnp.sum(jnp.square(cent), axis=1)
    cd = cn[None, :] - 2.0 * jnp.dot(q, cent.T,
                                     preferred_element_type=jnp.float32)
    _, sel = jax.lax.top_k(-cd, nprobe)          # [nq, nprobe] cell ids
    sel_start = starts[sel]                      # [nq, nprobe]
    sizes = starts[sel + 1] - sel_start          # [nq, nprobe]
    prefix = jnp.cumsum(sizes, axis=1)           # [nq, nprobe]
    total = prefix[:, -1:]                       # [nq, 1]

    budget = int(budget)
    chunk = int(min(chunk, budget))
    n_steps = -(-budget // chunk)
    k = int(min(k, budget))

    def body(carry, step):
        best_d, best_i = carry
        t = step * chunk + jnp.arange(chunk, dtype=jnp.int32)  # [chunk]
        # which probed cell does candidate slot t fall in: the number of
        # prefix sums <= t (vectorized searchsorted; nprobe is small)
        j = jnp.sum((prefix[:, None, :] <= t[None, :, None]).astype(
            jnp.int32), axis=2)                  # [nq, chunk]
        j = jnp.minimum(j, nprobe - 1)
        prev = jnp.where(j > 0,
                         jnp.take_along_axis(
                             prefix, jnp.maximum(j - 1, 0), axis=1), 0)
        pos = (jnp.take_along_axis(sel_start, j, axis=1)
               + (t[None, :] - prev))            # [nq, chunk] sorted rows
        valid = t[None, :] < total
        pos = jnp.where(valid, pos, 0)
        rows = _dequant_f32(jnp.take(g, pos, axis=0),
                            None if g_scale is None
                            else jnp.take(g_scale, pos, axis=0))
        rn = jnp.sum(jnp.square(rows), axis=2)   # [nq, chunk]
        dots = jnp.einsum('nd,ncd->nc', q, rows,
                          preferred_element_type=jnp.float32)
        d2 = jnp.maximum(qn + rn - 2.0 * dots, 0.0)
        d2 = jnp.where(valid, d2, jnp.inf)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, pos], axis=1)
        neg, si = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, si, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    if _vary_axes is not None:
        # under shard_map the scan carry must match the body output's
        # varying-manual-axes type (it varies via the shard's rows)
        init = jax.lax.pcast(init, _vary_axes, to='varying')
    (best_d, best_i), _ = jax.lax.scan(
        body, init, jnp.arange(n_steps, dtype=jnp.int32))
    best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
    return jnp.sqrt(best_d), best_i


def default_nlist(ng):
    """FAISS-style heuristic: ~4*sqrt(N) cells, clamped to sane bounds."""
    return int(max(16, min(ng // 8, 4 * np.sqrt(max(ng, 1)))))
