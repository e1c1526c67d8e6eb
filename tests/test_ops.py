"""Golden-value tests for the TPU-native custom ops vs numpy reference
implementations transcribed from the reference C++ semantics
(modeled on reference tests/test_zero_even_op.py's golden-value style)."""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.ops.batch_hard import batch_hard
from pps_tpu.ops.cross_entropy import cross_entropy_with_logits
from pps_tpu.ops.distance import euclidean_distmat, pairwise_sq_dist


# -- numpy references (transcribed semantics, not code, from the ref ops) ----

def np_batch_hard(dist, labels):
    n = dist.shape[0]
    ap = np.zeros(n, np.float32)
    an = np.zeros(n, np.float32)
    idx_p = np.zeros(n, np.int64)
    idx_n = np.zeros(n, np.int64)
    for a in range(n):
        best_p, best_pi = 0.0, -1
        best_n, best_ni = np.inf, -1
        for j in range(n):
            if labels[j] == labels[a]:
                if best_p < dist[a, j]:
                    best_p, best_pi = dist[a, j], j
            else:
                if best_n > dist[a, j]:
                    best_n, best_ni = dist[a, j], j
        ap[a], an[a], idx_p[a], idx_n[a] = best_p, best_n, best_pi, best_ni
    return ap, an, idx_p, idx_n


def np_ce_with_logits(probs, labels):
    n = probs.shape[0]
    p = np.maximum(probs, 1e-20)
    op = np.maximum(1 - probs, 1e-20)
    return -np.sum(labels * np.log(p) + (1 - labels) * np.log(op)) / n


def test_pairwise_sq_dist():
    rng = np.random.RandomState(0)
    x = rng.randn(16, 8).astype(np.float32)
    got = np.asarray(pairwise_sq_dist(jnp.asarray(x)))
    want = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_euclidean_distmat_matches_numpy_eval_path():
    rng = np.random.RandomState(1)
    q = rng.randn(37, 64).astype(np.float32)
    g = rng.randn(101, 64).astype(np.float32)
    got = np.asarray(euclidean_distmat(jnp.asarray(q), jnp.asarray(g),
                                       block_q=16))
    sq1 = np.sum(q ** 2, axis=1)[:, None]
    sq2 = np.sum(g ** 2, axis=1)[None, :]
    d2 = -2 * q @ g.T + sq1 + sq2
    d2[d2 < 0] = 0
    want = np.sqrt(d2)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_batch_hard_forward():
    rng = np.random.RandomState(2)
    n = 16
    labels = np.repeat(np.arange(4), 4).astype(np.int32)
    dist = np.abs(rng.randn(n, n)).astype(np.float32)
    ap, an = batch_hard(jnp.asarray(dist), jnp.asarray(labels))
    ap_np, an_np, _, _ = np_batch_hard(dist, labels)
    np.testing.assert_allclose(np.asarray(ap), ap_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(an), an_np, atol=1e-6)


def test_batch_hard_gradient_routing():
    """Gradient must flow only to the single arg-hardest entry per row
    (reference batch_hard_op.cc:90-120 scatter semantics)."""
    rng = np.random.RandomState(3)
    n = 8
    labels = np.repeat(np.arange(2), 4).astype(np.int32)
    dist = np.abs(rng.randn(n, n)).astype(np.float32)

    def f(d):
        ap, an = batch_hard(d, jnp.asarray(labels))
        return jnp.sum(2.0 * ap + 3.0 * an)

    g = np.asarray(jax.grad(f)(jnp.asarray(dist)))
    _, _, idx_p, idx_n = np_batch_hard(dist, labels)
    want = np.zeros_like(dist)
    for a in range(n):
        want[a, idx_p[a]] = 2.0
        want[a, idx_n[a]] = 3.0
    np.testing.assert_allclose(g, want, atol=1e-6)


def test_cross_entropy_with_logits_forward():
    rng = np.random.RandomState(4)
    probs = rng.uniform(0, 1, size=(6, 10)).astype(np.float32)
    labels = np.zeros((6, 10), np.float32)
    labels[np.arange(6), rng.randint(0, 10, 6)] = 1
    got = float(cross_entropy_with_logits(jnp.asarray(probs),
                                          jnp.asarray(labels)))
    want = np_ce_with_logits(probs, labels)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_with_logits_grad_clip():
    """Gradient upper-clipped at 1e4 then scaled by 1/N
    (reference cross_entropy_wsl_op.cc:66-80)."""
    probs = jnp.asarray([[1e-30, 0.5]], jnp.float32)  # tiny prob w/ label 1
    labels = jnp.asarray([[1.0, 0.0]], jnp.float32)
    g = jax.grad(lambda p: cross_entropy_with_logits(p, labels))(probs)
    g = np.asarray(g)
    # -L/p would be -1e20; clip applies to the (positive-side) bound:
    # grad = min(-1/1e-20, 1e4)/1 = -1e20 ... the clip is an upper bound,
    # so the huge *negative* gradient passes through un-clipped.
    assert g[0, 0] < -1e19
    # for label 0, grad = 1/(1-p) = 2.0, under the clip
    np.testing.assert_allclose(g[0, 1], 2.0, rtol=1e-5)


def test_batch_hard_under_vmap():
    """triplet_losses vmaps batch_hard over the combo axis."""
    rng = np.random.RandomState(5)
    labels = np.repeat(np.arange(2), 4).astype(np.int32)
    dists = np.abs(rng.randn(3, 8, 8)).astype(np.float32)
    ap, an = jax.vmap(lambda d: batch_hard(d, jnp.asarray(labels)))(
        jnp.asarray(dists))
    for r in range(3):
        ap_np, an_np, _, _ = np_batch_hard(dists[r], labels)
        np.testing.assert_allclose(np.asarray(ap[r]), ap_np, atol=1e-6)
        np.testing.assert_allclose(np.asarray(an[r]), an_np, atol=1e-6)


def test_euclidean_distmat_fast_path():
    """bf16 cross-term path stays close to f32 on unit-norm features."""
    import numpy as np
    from pps_tpu.ops.distance import euclidean_distmat
    rng = np.random.RandomState(0)
    q = rng.randn(33, 96).astype(np.float32)
    g = rng.randn(57, 96).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    d32 = np.asarray(euclidean_distmat(q, g))
    dbf = np.asarray(euclidean_distmat(q, g, fast=True))
    np.testing.assert_allclose(dbf, d32, atol=5e-3)
