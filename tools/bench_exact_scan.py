#!/usr/bin/env python
"""Head-to-head shootout for the EXACT single-query gallery scan.

BASELINE.md round 3 measured the exact single-query top-100 over a
resident 1M x 3968-d int8 gallery at 29.7 ms — ~6x over the ~5 ms
HBM-bandwidth bound (4 GB at ~800 GB/s).  Two suspects:

1. the 244-step sequential chunk/merge dependency chain of the
   lax.scan formulation (ops/topk.streaming_topk), and
2. the per-chunk dequant `gi.astype(f32) * scale` — if XLA materializes
   the f32 chunk instead of fusing the convert into the dot, every
   chunk pays 2 extra f32 round-trips (~32 GB/query total).

Variants measured (all exact unless marked):

  stream<chunk>   the shipped streaming_topk at several chunk sizes
  flat-bf16       ONE dot over the whole gallery: int8 rows are exactly
                  representable in bf16, and per-row dequant scales
                  commute out of the matmul (q . (g8*s) = (q . g8) * s),
                  so the gallery is read ONCE as int8->bf16 with no f32
                  materialization; f32-exact query precision via a
                  2-row hi/lo bf16 query split; hierarchical top-k on
                  the [nq, Ng] distance row (tiny at nq=1)
  flat-int8       quantize the query to int8 and ride the 394-TOPS
                  s8xs8->s32 MXU path; approximate in the cross term
                  (error from query quantization only)
  flat-int8+ref   flat-int8 shortlist (top-1024) + exact f32 rescore of
                  the shortlist rows; exact whenever the true top-k
                  survives into the shortlist (reported: agreement vs
                  the exact scan)

Chained-scan slope timing throughout (CLAUDE.md: unchained
block_until_ready lies on this harness; per-call blocking adds ~25 ms
tunnel RTT).

  python tools/bench_exact_scan.py [--gallery-size 1000000] [--dim 3968]
      [--chunks 4096,16384,65536,262144] [--iters 50]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gallery-size', type=int, default=1_000_000)
    ap.add_argument('--dim', type=int, default=3968)
    ap.add_argument('--topk', type=int, default=100)
    ap.add_argument('--chunks', default='4096,16384,65536,262144')
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--nq', type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    from pps_tpu.ops.topk import streaming_topk

    ng, d, k, nq = args.gallery_size, args.dim, args.topk, args.nq
    rng = np.random.RandomState(0)
    g8 = rng.randint(-127, 128, size=(ng, d)).astype(np.int8)
    sc = (1.0 / (127.0 * np.sqrt(d)) *
          (1.0 + 0.1 * rng.rand(ng))).astype(np.float32)
    gd = jax.device_put(g8)
    sd = jax.device_put(sc)
    q = rng.randn(nq, d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jax.device_put(q)
    jax.block_until_ready(gd)

    # squared norms of the DEQUANTIZED rows, precomputed once per
    # gallery (any flat variant needs them; 4 MB at 1M rows)
    gn_host = (np.sum(g8.astype(np.float32) ** 2, axis=1)
               * sc.astype(np.float64) ** 2).astype(np.float32)
    gn = jax.device_put(gn_host)

    def hier_topk(d2, kk):
        """Exact top-k (ascending) of each [*, Ng] distance row via a
        two-level reduction: per-subblock top-k in one batched call,
        then one merge — avoids a single monolithic 1M-wide sort."""
        nq_, n = d2.shape
        m = 16384
        pad = (-n) % m
        d2p = jnp.pad(d2, ((0, 0), (0, pad)), constant_values=jnp.inf)
        nsub = d2p.shape[1] // m
        sub = d2p.reshape(nq_, nsub, m)
        kk1 = min(kk, m)
        negd, subi = jax.lax.top_k(-sub, kk1)          # [nq, nsub, kk1]
        base = (jnp.arange(nsub, dtype=jnp.int32) * m)[None, :, None]
        cand_i = (subi + base).reshape(nq_, nsub * kk1)
        cand_d = (-negd).reshape(nq_, nsub * kk1)
        neg2, sel = jax.lax.top_k(-cand_d, kk)
        return -neg2, jnp.take_along_axis(cand_i, sel, axis=1)

    def flat_bf16(qf, g, s, gnorm):
        """Exact distances in one gallery read: hi/lo bf16 query split
        (int8 gallery values are exact in bf16), dequant scale applied
        AFTER the dot."""
        qhi = qf.astype(jnp.bfloat16)
        qlo = (qf - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        qq = jnp.concatenate([qhi, qlo], axis=0)        # [2nq, d]
        ss = jax.lax.dot_general(
            qq, g.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [2nq, Ng]
        scores = (ss[:qf.shape[0]] + ss[qf.shape[0]:]) * s[None, :]
        qn = jnp.sum(jnp.square(qf), axis=1, keepdims=True)
        d2 = jnp.maximum(qn + gnorm[None, :] - 2.0 * scores, 0.0)
        return d2

    def flat_int8_scores(qf, g, s):
        qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                         1e-12) / 127.0
        q8 = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        si = jax.lax.dot_general(
            q8, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)            # [nq, Ng]
        return si.astype(jnp.float32) * qs * s[None, :]

    def flat_int8(qf, g, s, gnorm):
        scores = flat_int8_scores(qf, g, s)
        qn = jnp.sum(jnp.square(qf), axis=1, keepdims=True)
        return jnp.maximum(qn + gnorm[None, :] - 2.0 * scores, 0.0)

    def flat_int8_refined(qf, g, s, gnorm, shortlist=1024):
        d2a = flat_int8(qf, g, s, gnorm)
        _, cand = hier_topk(d2a, shortlist)              # [nq, S]
        rows = jnp.take(g, cand[0], axis=0).astype(jnp.float32) \
            * s[cand[0]][:, None]                        # nq==1 path
        d2x = (jnp.sum(jnp.square(qf), axis=1, keepdims=True)
               + jnp.sum(jnp.square(rows), axis=1)[None, :]
               - 2.0 * qf @ rows.T)
        dd, ii = jax.lax.top_k(-jnp.maximum(d2x, 0.0), min(k, shortlist))
        return -dd, jnp.take_along_axis(
            jnp.broadcast_to(cand, d2x.shape), ii, axis=1)

    # ---- correctness cross-check at bench scale (one dispatch each)
    ed, ei = streaming_topk(qd, gd, k=k, chunk=4096, g_scale=sd)
    ed, ei = np.asarray(ed), np.asarray(ei)

    def agree(ii, name):
        a = float(np.mean([len(set(ii[r].tolist())
                               & set(ei[r].tolist())) / k
                           for r in range(nq)]))
        return round(a, 4)

    fd2 = jax.jit(flat_bf16)(qd, gd, sd, gn)
    fbd, fbi = hier_topk(fd2, k)
    id2 = jax.jit(flat_int8)(qd, gd, sd, gn)
    _, ibi = hier_topk(id2, k)
    rfd, rfi = jax.jit(partial(flat_int8_refined))(qd, gd, sd, gn)
    checks = {
        'flat_bf16_topk_agree': agree(np.asarray(fbi), 'flat-bf16'),
        'flat_bf16_dist_maxdiff': round(float(np.max(np.abs(
            np.sqrt(np.asarray(fbd)) - ed))), 6),
        'flat_int8_topk_agree': agree(np.asarray(ibi), 'flat-int8'),
        'flat_int8_refined_agree': agree(np.asarray(rfi), 'refined'),
    }

    # ---- timing: chain n iterations through a data dependency
    def chain(fn_returning_scalar):
        @partial(jax.jit, static_argnums=(4,))
        def run(q0, g, s, gnorm, n):
            def body(carry, _):
                dep = fn_returning_scalar(carry, g, s, gnorm)
                return carry + dep * 1e-30, None
            o, _ = jax.lax.scan(body, q0, None, length=n)
            return o
        def timed(iters):
            def one(n):
                t0 = time.perf_counter()
                float(jnp.sum(run(qd, gd, sd, gn, n)))
                return time.perf_counter() - t0
            for n in (2, 2 + iters):
                one(n)
            return (one(2 + iters) - one(2)) / iters
        return timed

    results = {}

    for chunk in [int(c) for c in args.chunks.split(',')]:
        def dep_stream(qf, g, s, gnorm, _chunk=chunk):
            dd, ii = streaming_topk(qf, g, k=k, chunk=_chunk, g_scale=s)
            return (jnp.sum(dd) + jnp.sum(ii)).astype(jnp.float32)
        it = max(10, args.iters // 4) if chunk <= 8192 else args.iters
        results['stream%d' % chunk] = chain(dep_stream)(it) * 1e3

    def dep_flat_bf16(qf, g, s, gnorm):
        dd, ii = hier_topk(flat_bf16(qf, g, s, gnorm), k)
        return (jnp.sum(dd) + jnp.sum(ii)).astype(jnp.float32)
    results['flat_bf16'] = chain(dep_flat_bf16)(args.iters) * 1e3

    def dep_flat_int8(qf, g, s, gnorm):
        dd, ii = hier_topk(flat_int8(qf, g, s, gnorm), k)
        return (jnp.sum(dd) + jnp.sum(ii)).astype(jnp.float32)
    results['flat_int8'] = chain(dep_flat_int8)(args.iters) * 1e3

    def dep_flat_ref(qf, g, s, gnorm):
        dd, ii = flat_int8_refined(qf, g, s, gnorm)
        return (jnp.sum(dd) + jnp.sum(ii)).astype(jnp.float32)
    results['flat_int8_refined'] = chain(dep_flat_ref)(args.iters) * 1e3

    # measured speed-of-light: the fastest program that READS every
    # gallery byte — a carry-dependent elementwise xor fused into one
    # reduction (no HBM writes; the xor ties each iteration to the
    # chain carry so XLA cannot hoist the read out of the scan).  The
    # analytic 800 GB/s bound assumes spec-sheet bandwidth; a dot can
    # only ever reach THIS number.
    def dep_pure_read(qf, g, s, gnorm):
        tweak = jnp.sum(qf).astype(jnp.int8)
        return jnp.sum((g ^ tweak).astype(jnp.float32))
    results['pure_read'] = chain(dep_pure_read)(args.iters) * 1e3

    bw_bound_ms = (ng * d) / 800e9 * 1e3  # one int8 gallery read
    out = {
        'gallery_size': ng, 'dim': d, 'topk': k, 'nq': nq,
        'bandwidth_bound_ms': round(bw_bound_ms, 2),
        'measured_read_GBps': round((ng * d) / results['pure_read'] / 1e6,
                                    1),
        'latency_ms': {kk: round(vv, 3) for kk, vv in results.items()},
        'checks': checks,
        'device_kind': jax.devices()[0].device_kind,
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
