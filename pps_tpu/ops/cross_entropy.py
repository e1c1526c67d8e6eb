"""CrossEntropyWithLogits with the reference's exact clip semantics.

Despite its name, the reference op consumes *probabilities*
(/root/reference/detectron/ops/cross_entropy_wsl_op.cc:30-80):

  forward  loss = -(1/N) sum_i [ L_i log(max(X_i, 1e-20))
                               + (1-L_i) log(max(1-X_i, 1e-20)) ]
  backward dX_i = (1/N) min( dY * (-L_i/max(X_i,1e-20)
                                   + (1-L_i)/max(1-X_i,1e-20)), 1e4 )

The asymmetric gradient clip (upper bound only) is part of the CRM loss's
training dynamics, so it is reproduced via custom_vjp rather than relying
on autodiff of a clipped log.
"""

import jax
import jax.numpy as jnp

LOG_THRESHOLD = 1e-20
DIFF_THRESHOLD = 1e4


@jax.custom_vjp
def cross_entropy_with_logits(probs, labels):
    """probs, labels: [N, C]; returns scalar mean-over-N loss."""
    return _forward(probs, labels)


def _forward(probs, labels):
    n = probs.shape[0]
    p = jnp.maximum(probs, LOG_THRESHOLD)
    one_p = jnp.maximum(1.0 - probs, LOG_THRESHOLD)
    loss = -jnp.sum(labels * jnp.log(p) + (1.0 - labels) * jnp.log(one_p))
    return loss / n


def _fwd(probs, labels):
    return _forward(probs, labels), (probs, labels)


def _bwd(res, dy):
    probs, labels = res
    n = probs.shape[0]
    p = jnp.maximum(probs, LOG_THRESHOLD)
    one_p = jnp.maximum(1.0 - probs, LOG_THRESHOLD)
    grad = dy * (-labels / p + (1.0 - labels) / one_p)
    grad = jnp.minimum(grad, DIFF_THRESHOLD) / n
    return grad, None


cross_entropy_with_logits.defvjp(_fwd, _bwd)
