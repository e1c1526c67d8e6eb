"""Batch-hard example mining with reference-exact gradient routing.

TPU-native equivalent of the reference's ``BatchHard`` C++ op
(/root/reference/detectron/ops/batch_hard_op.cc:30-123):

forward   AP[a] = max(0, max_{p: l_p == l_a} D[a, p])   (self included)
          AN[a] = min_{n: l_n != l_a} D[a, n]
backward  dD[a, argmax_p] = dAP[a];  dD[a, argmin_n] = dAN[a]
          (gradient flows ONLY to the single arg-hardest element per row;
          ties broken toward the first index, matching the C++ scan order)

A naive jnp max/min would split gradient across ties, so the backward pass
is made explicit with one-hot scatters from argmax/argmin.
"""

import jax
import jax.numpy as jnp

_NEG_INF = -jnp.inf
_POS_INF = jnp.inf


@jax.custom_vjp
def batch_hard(dist, labels):
    """dist: [N, N] float32 distances; labels: [N] int32.

    Returns (dist_ap [N], dist_an [N]).
    """
    ap, an, _, _ = _batch_hard_fwd_impl(dist, labels)
    return ap, an


def _batch_hard_fwd_impl(dist, labels):
    pos = labels[:, None] == labels[None, :]
    masked_pos = jnp.where(pos, dist, _NEG_INF)
    masked_neg = jnp.where(pos, _POS_INF, dist)
    idx_p = jnp.argmax(masked_pos, axis=1)
    idx_n = jnp.argmin(masked_neg, axis=1)
    # reference forward starts the positive scan at 0 -> implicit relu
    ap = jnp.maximum(jnp.max(masked_pos, axis=1), 0.0)
    an = jnp.min(masked_neg, axis=1)
    return ap, an, idx_p, idx_n


def _batch_hard_fwd(dist, labels):
    ap, an, idx_p, idx_n = _batch_hard_fwd_impl(dist, labels)
    return (ap, an), (idx_p, idx_n, dist.shape[0])


def _batch_hard_bwd(res, grads):
    idx_p, idx_n, n = res
    d_ap, d_an = grads
    one_hot_p = jax.nn.one_hot(idx_p, n, dtype=d_ap.dtype)
    one_hot_n = jax.nn.one_hot(idx_n, n, dtype=d_an.dtype)
    d_dist = one_hot_p * d_ap[:, None] + one_hot_n * d_an[:, None]
    return d_dist, None


batch_hard.defvjp(_batch_hard_fwd, _batch_hard_bwd)
