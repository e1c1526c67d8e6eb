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


@functools.partial(jax.jit, static_argnames=('k', 'chunk'))
def streaming_topk(q, g, k=100, chunk=4096):
    """Returns (dists [Nq, k], indices [Nq, k]) of the k nearest gallery
    rows per query (Euclidean, ascending)."""
    nq, d = q.shape
    ng = g.shape[0]
    k = min(k, ng)
    q = q.astype(jnp.float32)
    g = g.astype(jnp.float32)

    pad = (-ng) % chunk
    gp = jnp.pad(g, ((0, pad), (0, 0)))
    n_chunks = gp.shape[0] // chunk
    gc = gp.reshape(n_chunks, chunk, d)
    qn = jnp.sum(jnp.square(q), axis=1, keepdims=True)

    def scan_body(carry, inp):
        best_d, best_i = carry
        gi, base = inp
        gn = jnp.sum(jnp.square(gi), axis=1)
        d2 = qn + gn[None, :] - 2.0 * jnp.dot(
            q, gi.T, preferred_element_type=jnp.float32)
        d2 = jnp.maximum(d2, 0.0)
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (nq, chunk), 1)
        # mask gallery pad rows
        valid = idx < ng
        d2 = jnp.where(valid, d2, jnp.inf)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        # top_k selects LARGEST; negate for nearest
        neg, sel = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((nq, k), jnp.inf, jnp.float32),
            jnp.full((nq, k), -1, jnp.int32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = jax.lax.scan(scan_body, init, (gc, bases))
    return jnp.sqrt(best_d), best_i
