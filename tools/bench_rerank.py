"""Market-scale k-reciprocal re-ranking benchmark: device vs host paths.

Full Market-1501 eval geometry by default (3368 queries + 15913 gallery =
19,281 images).  Compares the sparse-set XLA pipeline
(rerank_distmat_jax), the C++/OpenMP host path, and (at small sizes) the
numpy golden, with cross-checked numerics.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nq', type=int, default=3368)
    ap.add_argument('--ng', type=int, default=15913)
    ap.add_argument('--d', type=int, default=256)
    ap.add_argument('--check-numpy', action='store_true')
    ap.add_argument('--skip-native', action='store_true')
    args = ap.parse_args()

    import jax
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    from pps_tpu.evaluation.rerank import re_ranking, rerank_distmat_jax
    from pps_tpu import native

    rng = np.random.RandomState(0)
    n = args.nq + args.ng
    f = rng.randn(n, args.d).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    q, g = f[:args.nq], f[args.nq:]

    def dist(a, b):
        aa = np.sum(a * a, axis=1)[:, None]
        bb = np.sum(b * b, axis=1)[None, :]
        return np.sqrt(np.maximum(aa + bb - 2.0 * a @ b.T, 0.0))

    qg, qq, gg = dist(q, g), dist(q, q), dist(g, g)
    print('n=%d (%d q + %d g)' % (n, args.nq, args.ng))

    # device-put the distmats BEFORE timing: in the real eval path they
    # are computed on device, and through the tunneled harness link the
    # ~1.3 GB of H2D would otherwise dominate the measurement (CLAUDE.md)
    qg_d, qq_d, gg_d = (jax.device_put(a) for a in (qg, qq, gg))
    jax.block_until_ready(gg_d)
    t0 = time.perf_counter()
    dev = np.asarray(rerank_distmat_jax(qg_d, qq_d, gg_d))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    dev = np.asarray(rerank_distmat_jax(qg_d, qq_d, gg_d))
    t_dev = time.perf_counter() - t0
    print('device sparse-set: %.2f s (first call %.2f s incl. compile; '
          'device-resident inputs)' % (t_dev, t_first))

    if not args.skip_native and native.available():
        t0 = time.perf_counter()
        nat = native.rerank_native(qg, qq, gg)
        t_nat = time.perf_counter() - t0
        print('native C++/OpenMP: %.2f s  max|dev-native|=%.2e'
              % (t_nat, np.abs(dev - nat).max()))

    if args.check_numpy:
        t0 = time.perf_counter()
        ref = re_ranking(qg, qq, gg)
        print('numpy golden: %.2f s  max|dev-numpy|=%.2e'
              % (time.perf_counter() - t0, np.abs(dev - ref).max()))


if __name__ == '__main__':
    main()
