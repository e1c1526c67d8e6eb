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
    from pps_tpu.ops.pallas.topk import streaming_topk, quantize_gallery

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

    print(json.dumps(out))


if __name__ == '__main__':
    main()
