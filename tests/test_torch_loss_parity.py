"""Torch mirror of the TRAINING losses (independent of our jax code):
per-combo softmax CE, CRM two-softmax loss with the reference CE clipping,
and batch-hard triplet margin-ranking.  Complements
tests/test_torch_parity.py (inference graph)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pps_tpu.models import losses as loss_lib
from pps_tpu.models.heads import apply_crm

torch.set_grad_enabled(False)


def _torch_batch_hard_triplet(feats, labels, margin=1.4):
    """Reference semantics: L2-normalize, sqrt(clipped sq-dists),
    hardest pos/neg per anchor, mean(max(0, ap - an + margin))
    (reference triplet_loss.py:127-175, batch_hard_op.cc:30-123)."""
    x = torch.from_numpy(feats)
    x = x / x.norm(dim=1, keepdim=True).clamp_min(1e-12)
    d2 = (x.pow(2).sum(1)[:, None] + x.pow(2).sum(1)[None, :]
          - 2 * x @ x.T)
    dist = d2.clamp_min(1e-12).sqrt()
    lab = torch.from_numpy(labels)
    same = lab[:, None] == lab[None, :]
    ap = dist.masked_fill(~same, -np.inf).amax(1)
    an = dist.masked_fill(same, np.inf).amin(1)
    mrc = (ap - an + margin).clamp_min(0.0)
    return float(mrc.mean()), float(ap.mean()), float(an.mean())


def test_triplet_loss_matches_torch():
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(4), 2).astype(np.int32)
    feats = rng.randn(8, 3, 16).astype(np.float32)  # [B, R=3, D]
    mrc, ap, an = loss_lib.triplet_losses(jnp.asarray(feats),
                                          jnp.asarray(labels))
    for r in range(3):
        want_mrc, want_ap, want_an = _torch_batch_hard_triplet(
            feats[:, r], labels)
        np.testing.assert_allclose(float(mrc[r]), want_mrc, rtol=1e-5)
        np.testing.assert_allclose(float(ap[r]), want_ap, rtol=1e-5)
        np.testing.assert_allclose(float(an[r]), want_an, rtol=1e-5)


def test_softmax_ce_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(8, 5, 7).astype(np.float32)
    labels = rng.randint(0, 7, 8).astype(np.int32)
    ce, acc = loss_lib.softmax_ce_losses(jnp.asarray(logits),
                                         jnp.asarray(labels))
    for r in range(5):
        want = F.cross_entropy(torch.from_numpy(logits[:, r]),
                               torch.from_numpy(labels).long())
        np.testing.assert_allclose(float(ce[r]), float(want), rtol=1e-5)


def test_crm_loss_matches_torch():
    """CRM: alpha_cls = softmax over classes, alpha_det = softmax over
    combos, probs = sum_R(alpha_cls*alpha_det); loss = clipped binary CE
    vs one-hot (reference crm_heads.py:59-74,120-137)."""
    rng = np.random.RandomState(2)
    b, r, d, k = 6, 7, 16, 9
    feats = rng.randn(b, r, d).astype(np.float32)
    w_c = rng.randn(d, k).astype(np.float32)
    w_d = rng.randn(d, k).astype(np.float32)
    params = {'crm_fc8c_w': jnp.asarray(w_c),
              'crm_fc8c_b': jnp.zeros(k),
              'crm_fc8d_w': jnp.asarray(w_d),
              'crm_fc8d_b': jnp.zeros(k)}
    labels = rng.randint(0, k, b).astype(np.int32)
    oh = np.zeros((b, k), np.float32)
    oh[np.arange(b), labels] = 1

    probs = apply_crm(params, jnp.asarray(feats))
    loss, acc = loss_lib.crm_loss(probs, jnp.asarray(oh),
                                  jnp.asarray(labels))

    tf = torch.from_numpy(feats)
    fc8c = tf @ torch.from_numpy(w_c)
    fc8d = tf @ torch.from_numpy(w_d)
    alpha_cls = F.softmax(fc8c, dim=2)
    alpha_det = F.softmax(fc8d, dim=1)
    tprobs = (alpha_cls * alpha_det).sum(1)          # [B, K]
    np.testing.assert_allclose(np.asarray(probs), tprobs.numpy(),
                               rtol=1e-4, atol=1e-6)
    toh = torch.from_numpy(oh)
    p = tprobs.clamp_min(1e-20)
    one_p = (1 - tprobs).clamp_min(1e-20)
    want = -(toh * p.log() + (1 - toh) * one_p.log()).sum() / b
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
