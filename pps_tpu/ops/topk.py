"""Streaming top-k retrieval: nearest-k gallery entries per query without
materializing the [Nq, Ng] distance matrix in HBM.

This is the production serving op the reference never had (its retrieval
was a full numpy distmat + argsort, reference
reid_dataset_evaluator.py:104-125): the gallery is scanned in chunks, each
chunk's distances come from one MXU matmul, and a running (distance, index)
top-k is merged per chunk with ``jax.lax.top_k``.  Peak memory is
O(Nq * (chunk + k)) — gallery size scales past HBM exactly like blockwise
attention scales past sequence length (SURVEY.md section 5, long-context
analog).

Why not a Pallas kernel: Mosaic has no lowering for sort/top_k primitives
(verified on v5e), so the selection step cannot live inside a kernel; the
lax.scan + MXU-matmul formulation below compiles to the same tiling with
XLA's native top-k.
"""

import functools

import jax
import jax.numpy as jnp


def quantize_gallery(g):
    """Per-row symmetric int8 quantization of a gallery matrix.

    Returns (g8 int8 [Ng, d], scale f32 [Ng]) for streaming_topk's
    ``g_scale`` form.  HBM cost drops 4x vs f32 — the difference between
    fitting and not fitting a million-entry gallery at the flagship
    3968-d embedding (1M x 3968 f32 = 15.9 GB > v5e HBM; int8 = 4 GB).
    """
    import numpy as np
    g = np.asarray(g, np.float32)
    scale = np.maximum(np.max(np.abs(g), axis=1) / 127.0, 1e-12)
    g8 = np.clip(np.round(g / scale[:, None]), -127, 127).astype(np.int8)
    return g8, scale.astype(np.float32)


@jax.jit
def gallery_norms(g, g_scale=None):
    """Squared L2 norms of the (dequantized) gallery rows, [Ng] f32.

    One fused reduction over the resident gallery (the int8 bytes are
    read once; no f32 copy materializes).  Precompute per placement and
    hand to ``flat_topk`` — otherwise every flat scan pays a second
    full-gallery read just to rebuild them.
    """
    if g_scale is None:
        return jnp.sum(jnp.square(g.astype(jnp.float32)), axis=1)
    rows = g.astype(jnp.float32) * g_scale.astype(jnp.float32)[:, None]
    return jnp.sum(jnp.square(rows), axis=1)


@functools.partial(jax.jit, static_argnames=('k',))
def flat_topk(q, g, k=100, g_scale=None, g_norm=None, n_valid=None,
              index_offset=None):
    """Exact top-k gallery scan as ONE dot over the whole resident
    gallery — the low-latency exact path for small query batches.

    Same contract as ``streaming_topk`` (Euclidean, ascending, -1/inf
    for never-filled slots, ``n_valid``/``index_offset`` shard
    semantics), but no sequential chunk chain: the 244-step
    ``lax.scan`` dependency chain is what held the shipped streaming
    scan at 29.5 ms for a single query over a 1M x 3968-d int8 gallery
    — 6x over the ~5 ms HBM read bound.  This formulation reads the
    gallery once into one MXU matmul and runs a two-level hierarchical
    top-k on the distance row: measured 6.06 ms (1.22x the bound) with
    top-100 agreement 1.0 vs the streaming scan (BASELINE.md,
    tools/bench_exact_scan.py shootout).

    Exactness on int8 galleries: int8 values are exactly representable
    in bfloat16 and the per-row dequant scale commutes out of the
    matmul (q . (g8 * s) = (q . g8) * s), so no f32 dequant copy ever
    materializes; full f32 query precision comes from a hi/lo bf16
    query split (q = hi + lo, two rows through the same dot).

    Memory: materializes the [Nq, Ng] distance row — callers gate on
    nq * ng (serving.RetrievalIndex routes through here below its
    elements budget, streaming_topk above it).
    """
    nq, d = q.shape
    ng = g.shape[0]
    k = min(k, ng)
    q = q.astype(jnp.float32)
    qn = jnp.sum(jnp.square(q), axis=1, keepdims=True)
    if g_scale is not None:
        assert g.dtype == jnp.int8, (
            'g_scale is for int8 galleries; got {}'.format(g.dtype))
        qhi = q.astype(jnp.bfloat16)
        qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        qq = jnp.concatenate([qhi, qlo], axis=0)         # [2nq, d]
        ss = jax.lax.dot_general(
            qq, g.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [2nq, Ng]
        scores = ((ss[:nq] + ss[nq:])
                  * g_scale.astype(jnp.float32)[None, :])
    else:
        scores = jnp.dot(q, g.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)
    if g_norm is None:
        g_norm = gallery_norms(g, g_scale)
    d2 = jnp.maximum(qn + g_norm[None, :] - 2.0 * scores, 0.0)
    ng_valid = ng if n_valid is None else n_valid
    col = jnp.arange(ng, dtype=jnp.int32)
    d2 = jnp.where(col[None, :] < ng_valid, d2, jnp.inf)

    # two-level exact top-k: per-subblock top-k in one batched call,
    # then one merge — avoids a monolithic Ng-wide sort.  Candidate
    # order (subblock-major, index-major within) preserves the
    # lowest-global-index tie rule of a full sort.
    m = 16384
    pad = (-ng) % m
    d2p = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
    nsub = d2p.shape[1] // m
    sub = d2p.reshape(nq, nsub, m)
    kk1 = min(k, m)
    negd, subi = jax.lax.top_k(-sub, kk1)                # [nq, nsub, kk1]
    base = (jnp.arange(nsub, dtype=jnp.int32) * m)[None, :, None]
    cand_i = (subi + base).reshape(nq, nsub * kk1)
    cand_d = negd.reshape(nq, nsub * kk1)                # negated d2
    neg, sel = jax.lax.top_k(cand_d, k)
    out_d = jnp.sqrt(-neg)
    out_i = jnp.take_along_axis(cand_i, sel, axis=1)
    out_i = jnp.where(jnp.isinf(out_d), -1, out_i)
    if index_offset is not None:
        out_i = jnp.where(out_i >= 0, out_i + index_offset, out_i)
    return out_d, out_i


@functools.partial(jax.jit, static_argnames=('k', 'chunk', 'recall_target',
                                             '_vary_axes'))
def streaming_topk(q, g, k=100, chunk=4096, recall_target=None,
                   g_scale=None, n_valid=None, index_offset=None,
                   _vary_axes=None):
    """Returns (dists [Nq, k], indices [Nq, k]) of the k nearest gallery
    rows per query (Euclidean, ascending).

    recall_target: None = exact (sort-based per-chunk merge).  A float in
    (0, 1] routes the per-chunk selection through the TPU's
    hardware-accelerated ``lax.approx_min_k`` with one exact final merge
    over the collected candidates — measured on v5e at 3368 queries x 1M
    gallery x top-100: exact 1.73 s, recall_target 0.95 -> 0.26 s (6.7x)
    at 0.9999 measured recall vs exact (BASELINE.md).  With k >= chunk
    per-chunk approximation has nothing to reduce, so that case routes
    through the exact scan (identical results, bounded memory).

    g_scale: per-row dequant scales for an int8-quantized gallery
    (quantize_gallery).  The gallery stays int8 in HBM (4x smaller);
    each chunk dequantizes on the fly, so the math equals running the
    float path on the dequantized gallery exactly.

    n_valid / index_offset (traced scalars, for the sharded-gallery path
    in ``pps_tpu.parallel.retrieval``): only the first ``n_valid`` rows of
    ``g`` are real (the rest is row padding from an uneven shard split and
    scores +inf), and returned indices are shifted by ``index_offset`` so
    each shard reports gallery-global positions.  Entries that never saw a
    valid row keep index -1 and distance +inf.
    """
    nq, d = q.shape
    ng = g.shape[0]
    k = min(k, ng)
    q = q.astype(jnp.float32)
    if g_scale is None:
        g = g.astype(jnp.float32)
    else:
        assert g.dtype == jnp.int8, (
            'g_scale is for int8 galleries; got {}'.format(g.dtype))
    ng_valid = ng if n_valid is None else n_valid

    pad = (-ng) % chunk
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    n_chunks = gp.shape[0] // chunk
    gc = gp.reshape(n_chunks, chunk, d)
    qn = jnp.sum(jnp.square(q), axis=1, keepdims=True)
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    if g_scale is not None:
        sc = jnp.pad(g_scale.astype(jnp.float32), (0, pad)).reshape(
            n_chunks, chunk)
        gc = (gc, sc)
    else:
        gc = (gc, None)

    def dequant(gi_sc):
        gi, sci = gi_sc
        if sci is None:
            return gi
        return gi.astype(jnp.float32) * sci[:, None]

    if recall_target is not None and k < chunk:
        # approx_min_k reduces within a chunk, so with k >= chunk there
        # is no approximation left to do — that case falls through to
        # the exact scan below, whose O(nq*(chunk+k)) streaming merge
        # handles any k (stacking whole chunks as "candidates" here
        # would materialize the dense [Nq, Ng] matrix this module
        # exists to avoid).
        kc = k

        def approx_body(_, inp):
            gi_sc, base = inp
            gi = dequant(gi_sc)
            gn = jnp.sum(jnp.square(gi), axis=1)
            d2 = qn + gn[None, :] - 2.0 * jnp.dot(
                q, gi.T, preferred_element_type=jnp.float32)
            idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (nq, chunk), 1)
            d2 = jnp.where(idx < ng_valid, jnp.maximum(d2, 0.0), jnp.inf)
            bd, bi = jax.lax.approx_min_k(
                d2, kc, recall_target=float(recall_target))
            return None, (bd, jnp.take_along_axis(idx, bi, axis=1))

        _, (ds, is_) = jax.lax.scan(approx_body, None, (gc, bases))
        cand_d = jnp.moveaxis(ds, 0, 1).reshape(nq, -1)
        cand_i = jnp.moveaxis(is_, 0, 1).reshape(nq, -1)
        neg, sel = jax.lax.top_k(-cand_d, k)  # exact final merge
        out_d = jnp.sqrt(-neg)
        out_i = jnp.take_along_axis(cand_i, sel, axis=1)
        out_i = jnp.where(jnp.isinf(out_d), -1, out_i)
        if index_offset is not None:
            out_i = jnp.where(out_i >= 0, out_i + index_offset, out_i)
        return out_d, out_i

    def scan_body(carry, inp):
        best_d, best_i = carry
        gi_sc, base = inp
        gi = dequant(gi_sc)
        gn = jnp.sum(jnp.square(gi), axis=1)
        d2 = qn + gn[None, :] - 2.0 * jnp.dot(
            q, gi.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(d2, 0.0)
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (nq, chunk), 1)
        # mask gallery pad rows
        valid = idx < ng_valid
        d2 = jnp.where(valid, d2, jnp.inf)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        # top_k selects LARGEST; negate for nearest
        neg, sel = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    if _vary_axes is not None:
        # under shard_map the scan carry must carry the same
        # varying-manual-axes type as the body output (which varies via
        # the shard's gallery rows); mark the constant init accordingly
        init = jax.lax.pcast(init, _vary_axes, to='varying')
    (best_d, best_i), _ = jax.lax.scan(scan_body, init, (gc, bases))
    best_i = jnp.where(jnp.isinf(best_d), -1, best_i)
    if index_offset is not None:
        best_i = jnp.where(best_i >= 0, best_i + index_offset, best_i)
    return jnp.sqrt(best_d), best_i
