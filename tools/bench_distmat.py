"""Eval-distmat benchmark (XLA expand-form) at Market eval geometry.

Timing protocol: slope method — dispatch N executions back-to-back and
force completion with one scalar readback, for two values of N; the
per-iteration time is the slope.  On this harness's tunneled PJRT plugin
this is the only honest protocol: `block_until_ready` on an unchained
output array can return before device execution finishes (measured
0.03 ms for a 426 GFLOP program), and blocking per iteration adds the
~25 ms tunnel RTT to every sample.

History: a hand-written Pallas tiled distmat kernel was benchmarked here
and retired in round 2 — XLA's expand-form hits 134.7 TFLOP/s on v5e
(single bf16 MXU pass + fused epilogue at default matmul precision; the
`fast` flag is measurement-identical) vs 88.3 TFLOP/s for the best
Pallas tiling (block_q=512, block_g=512, full-depth blocks).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _slope_time(fn, consume, n_small=2, n_big=22):
    """Per-iteration device time via the slope of N-dispatch chains."""
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        consume(out)
        return time.perf_counter() - t0
    run(2)  # warm / compile
    ts, tb = run(n_small), run(n_big)
    return (tb - ts) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nq', type=int, default=3368)
    ap.add_argument('--ng', type=int, default=15913)
    ap.add_argument('--d', type=int, default=3968)
    args = ap.parse_args()

    import jax
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    import jax.numpy as jnp
    from pps_tpu.ops.distance import euclidean_distmat

    rng = np.random.RandomState(0)
    q = rng.randn(args.nq, args.d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g = rng.randn(args.ng, args.d).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qd, gd = jax.device_put(q), jax.device_put(g)
    float(jnp.sum(qd))  # settle
    flops = 2.0 * args.nq * args.ng * args.d

    def consume(out):
        float(jnp.sum(out))

    ref = None
    for name, fn in [
        ('xla_f32', lambda: euclidean_distmat(qd, gd)),
        ('xla_fast', lambda: euclidean_distmat(qd, gd, fast=True)),
    ]:
        t = _slope_time(fn, consume)
        out = np.asarray(fn())
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        print('%-10s %7.2f ms  %6.1f TFLOP/s  max|d-dref|=%.2e'
              % (name, t * 1e3, flops / t / 1e12, err))


if __name__ == '__main__':
    main()
