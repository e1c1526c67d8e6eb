"""ZeroEven: zero out even indices of a 1-D tensor.

The reference's kernel-authoring tutorial/smoke-test op
(/root/reference/detectron/ops/zero_even_op.cc:40-52,
tests/test_zero_even_op.py) — kept for the same purpose here: the minimal
end-to-end Pallas kernel with a golden-value test.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _zero_even_kernel(x_ref, out_ref):
    n = x_ref.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out_ref[:] = jnp.where(idx % 2 == 0, 0.0, x_ref[:])


def zero_even(x, interpret=False):
    """x: 1-D float array; returns x with even indices zeroed."""
    assert x.ndim == 1, 'ZeroEven expects a 1-D tensor (zero_even_op.cc:44)'
    n = x.shape[0]
    pad = (-n) % 128
    xp = jnp.pad(x.astype(jnp.float32), (0, pad)).reshape(1, -1)
    out = pl.pallas_call(
        _zero_even_kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)
    return out.reshape(-1)[:n].astype(x.dtype)
