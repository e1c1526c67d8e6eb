"""Distmat shootout: XLA expand-form vs Pallas kernel, f32 and bf16-fast.

Market-scale eval shape by default (3368 queries x 15913 gallery, 3968-d
flagship embeddings).  Prints TFLOP/s per variant and a tile sweep for the
Pallas kernel so the default tiles in ops/pallas/distmat.py stay honest.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _time(fn, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nq', type=int, default=3368)
    ap.add_argument('--ng', type=int, default=15913)
    ap.add_argument('--d', type=int, default=3968)
    ap.add_argument('--sweep', action='store_true')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    from pps_tpu.ops.distance import euclidean_distmat
    from pps_tpu.ops.pallas.distmat import pallas_euclidean_distmat

    rng = np.random.RandomState(0)
    q = rng.randn(args.nq, args.d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    g = rng.randn(args.ng, args.d).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    qd, gd = jax.device_put(q), jax.device_put(g)
    flops = 2.0 * args.nq * args.ng * args.d

    ref = None
    for name, fn in [
        ('xla_f32', lambda: euclidean_distmat(qd, gd)),
        ('xla_fast', lambda: euclidean_distmat(qd, gd, fast=True)),
        ('pallas_f32', lambda: pallas_euclidean_distmat(qd, gd)),
        ('pallas_fast', lambda: pallas_euclidean_distmat(
            qd, gd, fast=True)),
    ]:
        t = _time(fn)
        out = np.asarray(fn())
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        print('%-12s %7.2f ms  %6.1f TFLOP/s  max|d-dref|=%.2e'
              % (name, t * 1e3, flops / t / 1e12, err))

    if args.sweep:
        for bq in (256, 512, 1024):
            for bg in (256, 512, 1024):
                for bd in (512, 1024, 1984 if args.d % 1984 == 0 else 992):
                    try:
                        t = _time(lambda: pallas_euclidean_distmat(
                            qd, gd, block_q=bq, block_g=bg, block_d=bd,
                            fast=True), iters=5)
                        print('pallas_fast bq=%4d bg=%4d bd=%4d  '
                              '%7.2f ms  %6.1f TFLOP/s'
                              % (bq, bg, bd, t * 1e3, flops / t / 1e12))
                    except Exception as e:
                        print('pallas_fast bq=%4d bg=%4d bd=%4d  FAIL %s'
                              % (bq, bg, bd, type(e).__name__))


if __name__ == '__main__':
    main()
