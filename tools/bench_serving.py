#!/usr/bin/env python
"""Single-query serving latency: embed one image + top-k against a
device-resident million-entry gallery.

The production interactive-retrieval metric (throughput benchmarks
measure batched offline extraction; this measures what one user waits).
Device time via the chained-scan protocol (CLAUDE.md: per-call blocking
through the tunnel adds ~25 ms RTT per sample, so N iterations are
chained through a data dependency inside one jit and timed together).

  python tools/bench_serving.py [--gallery-size 1000000] [--dim 3968]
      [--int8-gallery] [--topk 100]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gallery-size', type=int, default=1_000_000)
    ap.add_argument('--dim', type=int, default=3968)
    ap.add_argument('--topk', type=int, default=100)
    ap.add_argument('--chunk', type=int, default=4096)
    ap.add_argument('--f32-gallery', action='store_true',
                    help='hold the gallery f32 (default int8; f32 at '
                         '1M x 3968-d does not fit v5e HBM)')
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--rerank', action='store_true',
                    help='also time the per-query k-reciprocal re-rank '
                         'of the top-k shortlist (a HOST stage after the '
                         'device scan: gather+dequant k rows, euclidean, '
                         're_ranking) and report the combined latency')
    ap.add_argument('--ivf', action='store_true',
                    help='also benchmark the IVF index (ops/ivf): build '
                         'time, probe-scan latency vs the exact scan, '
                         'recall@k.  Uses a CLUSTERED synthetic gallery '
                         '(the re-ID regime IVF exploits) for both paths '
                         'so the comparison is honest.')
    ap.add_argument('--ivf-nprobe', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    import __graft_entry__ as g
    from pps_tpu.models.model import build_model
    from pps_tpu.models.quantize import quantize_for_eval
    from pps_tpu.ops.topk import streaming_topk, quantize_gallery

    cfg = g._flagship_cfg()
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    w, h = cfg.REID.SCALE

    # int8 body for the embed step (the serving configuration)
    calib = (rng.randn(64, h, w, 3) * 50).astype(np.float32)
    qparams = jax.device_put(quantize_for_eval(model, params, state, calib))

    ng, d = args.gallery_size, args.dim
    if args.f32_gallery:
        gal = rng.randn(ng, d).astype(np.float32)
        gal /= np.linalg.norm(gal, axis=1, keepdims=True)
        gd, sd = jax.device_put(gal), None
    elif args.ivf:
        # clustered identities (~100 rows/id), generated chunkwise in
        # int8 to keep host memory at the gallery's own 4 GB footprint
        n_ids = max(1, ng // 100)
        centers = rng.randint(-100, 101, size=(n_ids, d)).astype(np.int8)
        g8 = np.empty((ng, d), np.int8)
        owner = rng.randint(n_ids, size=ng)
        for s in range(0, ng, 65536):
            e = min(s + 65536, ng)
            noise = rng.randint(-6, 7, size=(e - s, d))
            g8[s:e] = np.clip(centers[owner[s:e]].astype(np.int16)
                              + noise, -127, 127).astype(np.int8)
        sc = np.full((ng,), 1.0 / (127.0 * np.sqrt(d)), np.float32)
        gd, sd = jax.device_put(g8), jax.device_put(sc)
    else:
        g8 = rng.randint(-127, 128, size=(ng, d)).astype(np.int8)
        sc = np.full((ng,), 1.0 / (127.0 * np.sqrt(d)), np.float32)
        gd, sd = jax.device_put(g8), jax.device_put(sc)
    jax.block_until_ready(gd)

    img = jax.device_put(rng.randn(1, h, w, 3).astype(np.float32) * 50)

    def embed(qp, st, x):
        f = model.extract_features(qp, st, x)
        if f.shape[1] > d:
            f = f[:, :d]
        elif f.shape[1] < d:
            f = jnp.pad(f, ((0, 0), (0, d - f.shape[1])))
        return f

    @partial(jax.jit, static_argnums=5)
    def serve_chain(x, qp, st, gal, gsc, n):
        """n chained end-to-end queries: embed -> top-k; the next
        query's input depends on the previous result (no overlap).
        The gallery AND the model weights/state are ARGUMENTS (a
        closure capture would bake them into the lowered program as
        constants — 4 GB for the gallery, ~25 MB per weight set — and
        key the compile cache on the weight values)."""
        def body(carry, _):
            q = embed(qp, st, carry)
            dist, idx = streaming_topk(q, gal, k=args.topk,
                                       chunk=args.chunk, g_scale=gsc)
            # fold the result back into the next input (real dependency;
            # 1e-30 scale keeps the image numerically unchanged)
            dep = (jnp.sum(dist) + jnp.sum(idx)).astype(jnp.float32)
            return carry + dep * 1e-30, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    def run(n):
        t0 = time.perf_counter()
        float(jnp.sum(serve_chain(img, qparams, state, gd, sd, n)))
        return time.perf_counter() - t0

    for n in (2, 2 + args.iters):
        run(n)  # compile both trip counts
    lat = (run(2 + args.iters) - run(2)) / args.iters

    out = {
        'single_query_latency_ms': round(lat * 1e3, 2),
        'gallery_size': ng, 'dim': d, 'topk': args.topk,
        'gallery_dtype': 'float32' if args.f32_gallery else 'int8',
        'embed': 'int8-ptq flagship ({}x{})'.format(h, w),
        'device_kind': jax.devices()[0].device_kind,
    }

    if args.rerank:
        # the re-rank increment is pure host work on the k-row shortlist
        # (serving.RetrievalIndex.search_reranked): gather+dequant the
        # candidate rows from the host mirror, two small euclidean
        # matrices, then the golden k-reciprocal math on a (k+1)-set.
        # Timed standalone — it overlaps nothing on the device.
        from pps_tpu import native
        from pps_tpu.engine.serving import _rerank_small
        from pps_tpu.evaluation.metrics import compute_dist
        qv = rng.randn(1, d).astype(np.float32)
        qv /= np.linalg.norm(qv)
        cand = rng.choice(ng, size=args.topk, replace=False)
        host_g = gal if args.f32_gallery else g8
        host_s = None if args.f32_gallery else sc

        def host_stage():
            rows = host_g[cand].astype(np.float32)
            if host_s is not None:
                rows *= host_s[cand][:, None]
            qg = compute_dist(qv, rows, 'euclidean')
            gg = compute_dist(rows, rows, 'euclidean')
            rr = _rerank_small(qg, np.zeros((1, 1), np.float32), gg,
                               20, 6, 0.3)[0]
            return np.argsort(rr, kind='stable')

        host_stage()  # warm numpy
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            host_stage()
        host_ms = (time.perf_counter() - t0) / reps * 1e3
        out['rerank_host_ms'] = round(host_ms, 2)
        out['rerank_engine'] = ('native' if native.available()
                                else 'numpy')
        out['reranked_total_ms'] = round(lat * 1e3 + host_ms, 2)

    if args.ivf:
        assert not args.f32_gallery, '--ivf bench assumes the int8 path'
        from pps_tpu.ops import ivf as ivf_ops
        nlist = ivf_ops.default_nlist(ng)
        t0 = time.perf_counter()
        # kmeans samples on the HOST copy (slicing a device array back
        # through the ~45 MB/s tunnel would dwarf the clustering itself)
        cent = ivf_ops.kmeans(g8, nlist, iters=10, seed=0, g_scale=sc,
                              sample=131072)
        jax.block_until_ready(cent)
        t_kmeans = time.perf_counter() - t0
        t0 = time.perf_counter()
        # ... while assignment reads the already-resident device gallery
        assign = ivf_ops.assign_clusters(gd, cent, g_scale=sd)
        perm, starts = ivf_ops.build_ivf(assign, nlist)
        t_assign = time.perf_counter() - t0

        # recall queries near identity centers (the serving regime)
        qn = 64
        qv = (g8[rng.randint(ng, size=qn)].astype(np.float32)
              + rng.randn(qn, d) * 2.0) * float(sc[0])
        qd = jax.device_put(qv.astype(np.float32))
        _, ei = streaming_topk(qd, gd, k=args.topk, chunk=args.chunk,
                               g_scale=sd)
        ei = np.asarray(ei)

        # cell-sort ON DEVICE (an HBM gather, not a 4 GB host round-trip)
        perm_dev = jax.device_put(perm)
        take = jax.jit(lambda a, p: jnp.take(a, p, axis=0))
        gd_sorted = take(gd, perm_dev)
        sd_sorted = take(sd, perm_dev)
        jax.block_until_ready(gd_sorted)
        del gd  # free the unsorted 4 GB before the probe chains
        starts_dev = jax.device_put(starts)
        budget = max(4096, 4 * args.ivf_nprobe * (ng // max(nlist, 1)))

        def recall_at(nprobe, bgt):
            _, pos = ivf_ops.ivf_topk(qd, gd_sorted, cent, starts_dev,
                                      k=args.topk, nprobe=nprobe,
                                      budget=bgt, chunk=1024,
                                      g_scale=sd_sorted)
            got = perm[np.clip(np.asarray(pos), 0, ng - 1)]
            return float(np.mean([
                len(set(got[r].tolist()) & set(ei[r].tolist()))
                / ei.shape[1] for r in range(qn)]))

        recall_sweep = {
            np_: round(recall_at(np_, max(4096, 4 * np_ *
                                          (ng // max(nlist, 1)))), 4)
            for np_ in sorted({args.ivf_nprobe, 2 * args.ivf_nprobe,
                               4 * args.ivf_nprobe})}
        recall = recall_sweep[args.ivf_nprobe]

        q1 = jax.device_put(qv[:1].astype(np.float32))

        @partial(jax.jit, static_argnums=(3,))
        def exact_chain(q0, gal, gsc, n):
            def body(q, _):
                _, idx = streaming_topk(q, gal, k=args.topk,
                                        chunk=args.chunk, g_scale=gsc)
                return q + jnp.sum(idx).astype(jnp.float32) * 1e-30, None
            q, _ = jax.lax.scan(body, q0, None, length=n)
            return q

        @partial(jax.jit, static_argnums=(5,))
        def ivf_chain(q0, gal, gsc, cents, st, n):
            def body(q, _):
                # depend on positions, not distances: unfilled slots are
                # +inf and would poison the carry
                _, p = ivf_ops.ivf_topk(q, gal, cents, st, k=args.topk,
                                        nprobe=args.ivf_nprobe,
                                        budget=budget, g_scale=gsc)
                return q + jnp.sum(p).astype(jnp.float32) * 1e-30, None
            q, _ = jax.lax.scan(body, q0, None, length=n)
            return q

        def run_scan(fn, *fargs, mult=1):
            """mult: extra iterations for sub-ms chains, where the
            default iteration count sits inside host timer noise (the
            first IVF probe measurement came back NEGATIVE)."""
            iters = args.iters * mult
            def one(n):
                t0 = time.perf_counter()
                float(jnp.sum(fn(q1, *fargs, n)))
                return time.perf_counter() - t0
            for n in (2, 2 + iters):
                one(n)
            return (one(2 + iters) - one(2)) / iters

        exact_ms = run_scan(exact_chain, gd_sorted, sd_sorted) * 1e3
        ivf_ms = run_scan(ivf_chain, gd_sorted, sd_sorted, cent,
                          starts_dev, mult=25) * 1e3

        # end-to-end single query through the IVF probe (embed + scan
        # chained, same protocol as the exact e2e above)
        @partial(jax.jit, static_argnums=(6,))
        def e2e_ivf_chain(x, qp, st, gal, gsc, cents, n, starts_d):
            def body(carry, _):
                qq = embed(qp, st, carry)
                _, p = ivf_ops.ivf_topk(qq, gal, cents, starts_d,
                                        k=args.topk,
                                        nprobe=args.ivf_nprobe,
                                        budget=budget, g_scale=gsc)
                dep = jnp.sum(p).astype(jnp.float32)
                return carry + dep * 1e-30, None
            o, _ = jax.lax.scan(body, x, None, length=n)
            return o

        def run_e2e(n):
            t0 = time.perf_counter()
            float(jnp.sum(e2e_ivf_chain(img, qparams, state, gd_sorted,
                                        sd_sorted, cent, n,
                                        starts_d=starts_dev)))
            return time.perf_counter() - t0

        for n in (2, 2 + args.iters):
            run_e2e(n)
        e2e_ivf_ms = (run_e2e(2 + args.iters) - run_e2e(2)) \
            / args.iters * 1e3

        out['ivf'] = {
            'nlist': nlist, 'nprobe': args.ivf_nprobe, 'budget': budget,
            'build_kmeans_s': round(t_kmeans, 2),
            'build_assign_s': round(t_assign, 2),
            'recall_at_%d' % args.topk: round(recall, 4),
            'recall_sweep_nprobe': recall_sweep,
            'exact_scan_ms': round(exact_ms, 3),
            'ivf_scan_ms': round(ivf_ms, 3),
            'scan_speedup': round(exact_ms / max(ivf_ms, 1e-9), 1),
            'single_query_e2e_ivf_ms': round(e2e_ivf_ms, 2),
        }

    print(json.dumps(out))


if __name__ == '__main__':
    main()
