"""Training losses for the re-ID model.

Re-implements (TPU-native, stacked over the combination axis):
* per-combo softmax CE + accuracy  (reference reid_heads.py:139-166)
* CRM attention loss               (reference crm_heads.py:103-139)
* per-combo batch-hard triplet     (reference triplet_loss.py:127-193)

The reference sums one scalar loss blob per combination with gradient
weights handled by ``get_loss_gradients_weighted``; here the total
differentiable loss is

  total = sum_r CE_r + CRM + triplet_weight * sum_r triplet_r * scale

where ``scale`` is the runtime ``loss_scale_factor`` blob of the
TRIPLET_LOSS_CROSS epoch-alternation scheme (triplet_loss.py:160-171) —
passed as a traced scalar so one compiled graph covers both epoch types.
"""

import jax
import jax.numpy as jnp

from pps_tpu.ops.batch_hard import batch_hard
from pps_tpu.ops.cross_entropy import cross_entropy_with_logits
from pps_tpu.ops.distance import pairwise_sq_dist

TRIPLET_WEIGHT = 0.14  # reference reid_heads.py:183
TRIPLET_MARGIN = 1.4   # reference reid_heads.py:184


def softmax_ce_losses(logits, labels):
    """Per-combo softmax cross entropy, mean over batch.

    logits: [B, R, K]; labels: [B] int in [0, K).
    Returns (losses [R], accuracies [R]).
    """
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(log_probs, labels[:, None, None],
                                 axis=2)[..., 0]           # [B, R]
    losses = -jnp.mean(picked, axis=0)                     # [R]
    acc = jnp.mean(
        (jnp.argmax(logits, axis=-1) == labels[:, None]).astype(jnp.float32),
        axis=0)
    return losses, acc


def crm_loss(probs, labels_oh, labels):
    """CRM image-level loss + accuracy (reference crm_heads.py:120-137)."""
    loss = cross_entropy_with_logits(probs, labels_oh)
    acc = jnp.mean((jnp.argmax(probs, axis=-1) == labels).astype(jnp.float32))
    return loss, acc


def triplet_losses(features, labels, margin=TRIPLET_MARGIN, normalize=True):
    """Per-combo batch-hard triplet margin-ranking loss.

    features: [B, R, D]; labels: [B] int32.
    Returns (mrc_mean [R], dist_ap_mean [R], dist_an_mean [R]).

    Per combo (reference triplet_loss.py:127-175): L2-normalize features,
    squared pairwise distance, clip@1e-12, sqrt, batch-hard mining, then
    MarginRankingCriterion with y=-1: max(0, ap - an + margin), averaged.
    """
    x = jnp.transpose(features, (1, 0, 2))  # [R, B, D]
    if normalize:
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
        x = x / jnp.maximum(norm, 1e-12)

    def per_combo(xr):
        d2 = pairwise_sq_dist(xr)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        ap, an = batch_hard(dist, labels)
        mrc = jax.nn.relu(ap - an + margin)
        return jnp.mean(mrc), jnp.mean(ap), jnp.mean(an)

    mrc, ap_mean, an_mean = jax.vmap(per_combo)(x)
    return mrc, ap_mean, an_mean
