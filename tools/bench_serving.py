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

`--load` switches to the daemon load bench: closed-loop HTTP client
pools against the REAL tools/serve.py (int8 gallery fabricated at the
flagship embedding dim), recording QPS + p50/p95/p99 per concurrency
level and per mode (exact / rerank=1 / IVF), plus the embed/search
batcher dispatch counters that evidence continuous batching.

  python tools/bench_serving.py --load [--load-concurrency 1,4,16,64]
      [--load-modes exact,rerank,ivf] [--load-duration 15]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FABRICATE = r'''
import os, sys
sys.path.insert(0, {root!r})
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
from pps_tpu.config import cfg, merge_cfg_from_file, assert_and_infer_cfg
merge_cfg_from_file({cfg_file!r})
assert_and_infer_cfg(make_immutable=False)
from pps_tpu.models.model import build_model
from pps_tpu.engine.checkpoint import save_checkpoint
model = build_model(cfg)
params, state = model.init(jax.random.PRNGKey(0))
save_checkpoint({ckpt!r}, model, params, state)
w, h = cfg.REID.SCALE
feat = jax.eval_shape(model.extract_features, params, state,
                      jax.ShapeDtypeStruct((1, h, w, 3), 'float32'))
d = int(feat.shape[1])
print('DIM', d, flush=True)

# clustered int8 gallery (~100 rows/identity, the regime IVF exploits)
ng = {ng}
rng = np.random.RandomState(0)
n_ids = max(1, ng // 100)
centers = rng.randint(-100, 101, size=(n_ids, d)).astype(np.int8)
owner = rng.randint(n_ids, size=ng)
g8 = np.empty((ng, d), np.int8)
for s in range(0, ng, 65536):
    e = min(s + 65536, ng)
    noise = rng.randint(-6, 7, size=(e - s, d))
    g8[s:e] = np.clip(centers[owner[s:e]].astype(np.int16) + noise,
                      -127, 127).astype(np.int8)
sc = np.full((ng,), 1.0 / (127.0 * np.sqrt(d)), np.float32)
paths = np.array(['row%07d' % i for i in range(ng)], dtype=object)
tmp = {npz!r} + '.tmp.npz'
with open(tmp, 'wb') as f:
    np.savez(f, gallery=g8, paths=paths, int8=np.array(True), scale=sc)
os.replace(tmp, {npz!r})
print('NPZ done', flush=True)

# query images: gallery-identity crops with pixel noise (PNG; the
# daemon decodes + resizes + embeds them per request)
import cv2
qdir = {qdir!r}
os.makedirs(qdir, exist_ok=True)
for j in range(16):
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(qdir, 'q%02d.png' % j), img)
print('QUERIES done', flush=True)
'''


def _http_json(url, timeout=120):
    import urllib.request
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read().decode('utf-8'))


def _start_server(args, work, mode, npz, extra):
    """Launch tools/serve.py on the real TPU and wait for readiness."""
    import subprocess
    ready = os.path.join(work, 'ready_%s' % mode)
    if os.path.exists(ready):
        os.unlink(ready)
    logf = open(os.path.join(work, 'serve_%s.log' % mode), 'w')
    cmd = [sys.executable, os.path.join(ROOT, 'tools', 'serve.py'),
           '--cfg', args.load_cfg, '--weights',
           os.path.join(work, 'model.pkl'), '--load-index', npz,
           '--port', '0', '--ready-file', ready,
           '--topk', str(args.topk), '--max-body-mb', '8'] + extra
    proc = subprocess.Popen(cmd, stdout=logf, stderr=logf, cwd=ROOT)
    deadline = time.time() + args.load_startup_timeout
    while not os.path.exists(ready):
        if proc.poll() is not None:
            raise RuntimeError('server (%s) died; see %s' %
                               (mode, logf.name))
        if time.time() > deadline:
            proc.terminate()
            raise RuntimeError('server (%s) never became ready' % mode)
        time.sleep(2.0)
    host, port = open(ready).read().split()
    return proc, host, int(port)


def _run_level(host, port, conc, duration, warmup, pngs, qparam):
    """Closed-loop client pool: `conc` keep-alive HTTP clients hammer
    /search for `duration` seconds; samples inside the warmup window
    are discarded.  Returns (latencies_ms sorted, qps, n_shed, err_kinds)
    where err_kinds counts CLIENT-side exceptions by class (each one
    also forces a reconnect) — kept separate from HTTP-status errors so
    a contended client pool (this harness host has one core) is
    distinguishable from server failures in the recorded rows."""
    import http.client
    import threading
    t_start = time.time()
    stop_at = t_start + warmup + duration
    lock = threading.Lock()
    samples, shed, http_errs = [], [0], [0]
    err_kinds = {}

    def worker(tid):
        conn = http.client.HTTPConnection(host, port, timeout=120)
        body = pngs[tid % len(pngs)]
        while time.time() < stop_at:
            t0 = time.perf_counter()
            ts = time.time()
            try:
                conn.request('POST', '/search?k=10' + qparam, body=body,
                             headers={'Content-Type': 'image/png'})
                resp = conn.getresponse()
                resp.read()
                ms = (time.perf_counter() - t0) * 1e3
                with lock:
                    if resp.status == 503:
                        shed[0] += 1
                    elif resp.status != 200:
                        http_errs[0] += 1
                    elif ts >= t_start + warmup:
                        samples.append(ms)
            except Exception as e:  # noqa: BLE001 - classify + reconnect
                kind = type(e).__name__
                with lock:
                    err_kinds[kind] = err_kinds.get(kind, 0) + 1
                try:
                    conn.close()
                except Exception:
                    pass
                conn = http.client.HTTPConnection(host, port, timeout=120)
        try:
            conn.close()
        except Exception:
            pass

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    samples.sort()
    if http_errs[0]:
        err_kinds['http_status'] = http_errs[0]
    return samples, len(samples) / duration, shed[0], err_kinds


def run_load(args):
    """VERDICT r3 item 1: measure the REAL daemon under concurrent load.

    Drives tools/serve.py (TPU, int8 1M-row gallery fabricated at the
    flagship embedding dim) over localhost HTTP with closed-loop client
    pools at increasing concurrency, in three modes: exact scan, IVF
    probe, and rerank=1.  Records QPS, p50/p95/p99, and the embed/search
    batcher dispatch counts (the continuous-batching claim under test:
    aggregate throughput should GROW with concurrency while per-request
    latency stays bounded, because concurrent embeds and scans coalesce
    into single device dispatches).

    Caveat recorded with the numbers: this harness host has ONE CPU
    core, so the HTTP+decode host path and the client pool contend for
    it — the measured QPS ceiling is the host's, not the device's; the
    dispatch counters separate the two.
    """
    import subprocess
    work = args.load_workdir
    os.makedirs(work, exist_ok=True)
    npz = os.path.join(work, 'index_%d.npz' % args.gallery_size)
    ivf_npz = os.path.join(work, 'index_%d_ivf.npz' % args.gallery_size)
    ckpt = os.path.join(work, 'model.pkl')
    qdir = os.path.join(work, 'queries')

    if not (os.path.exists(npz) and os.path.exists(ckpt)
            and os.path.isdir(qdir)):
        print('fabricating weights + %d-row index (one-off)...'
              % args.gallery_size, file=sys.stderr)
        script = _FABRICATE.format(root=ROOT, cfg_file=args.load_cfg,
                                   ckpt=ckpt, ng=args.gallery_size,
                                   npz=npz, qdir=qdir)
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        r = subprocess.run([sys.executable, '-c', script], env=env,
                           capture_output=True, text=True, timeout=3600)
        assert r.returncode == 0, r.stdout + r.stderr

    pngs = []
    for f in sorted(os.listdir(qdir)):
        with open(os.path.join(qdir, f), 'rb') as fh:
            pngs.append(fh.read())

    levels = [int(c) for c in args.load_concurrency.split(',')]
    results = []
    mode_plan = []
    modes = args.load_modes.split(',')
    if 'exact' in modes or 'rerank' in modes:
        shared = [m for m in ('exact', 'rerank') if m in modes]
        mode_plan.append((shared, npz, []))
    if 'ivf' in modes:
        if os.path.exists(ivf_npz):
            mode_plan.append((['ivf'], ivf_npz, []))
        else:
            mode_plan.append((['ivf'], npz,
                              ['--ivf', '--ivf-nprobe',
                               str(args.ivf_nprobe),
                               '--save-index', ivf_npz]))

    for group, use_npz, extra in mode_plan:
        proc, host, port = _start_server(args, work, group[0], use_npz,
                                         extra)
        base = 'http://%s:%d' % (host, port)
        try:
            for mode in group:
                qparam = '&rerank=1' if mode == 'rerank' else ''
                for conc in levels:
                    s0 = _http_json(base + '/stats')
                    lats, qps, n_shed, err_kinds = _run_level(
                        host, port, conc, args.load_duration,
                        args.load_warmup, pngs, qparam)
                    s1 = _http_json(base + '/stats')

                    def delta(section, key):
                        a = s0.get(section) or {}
                        b = s1.get(section) or {}
                        if key not in b:
                            return None
                        return b[key] - a.get(key, 0)

                    def pct(p):
                        if not lats:
                            return None
                        return round(lats[min(len(lats) - 1,
                                              int(p * len(lats)))], 1)

                    row = {
                        'mode': mode, 'concurrency': conc,
                        'qps': round(qps, 1),
                        'p50_ms': pct(0.50), 'p95_ms': pct(0.95),
                        'p99_ms': pct(0.99), 'n': len(lats),
                        'shed': n_shed,
                        'errors': sum(err_kinds.values()),
                        'error_kinds': err_kinds or None,
                        'embed_dispatches': delta('embed', 'dispatches'),
                        'embed_images': delta('embed', 'images'),
                        'search_dispatches': delta('search',
                                                   'dispatches'),
                        'search_queries': delta('search', 'queries'),
                    }
                    results.append(row)
                    print(json.dumps(row), flush=True)
        finally:
            proc.terminate()
            try:
                # a server started with --save-index re-saves the placed
                # rows on graceful shutdown — 4+ GB of npz for the 1M
                # gallery, well past a casual timeout
                proc.wait(timeout=600)
            except subprocess.TimeoutExpired:
                print('server (%s) still saving after 600 s; killing'
                      % group[0], file=sys.stderr)
                proc.kill()
                proc.wait(timeout=60)
            # collected rows must survive a teardown failure: rewrite
            # the artifact after every mode group
            out_path = os.path.join(work, 'LOADBENCH.json')
            with open(out_path, 'w') as f:
                json.dump({'gallery_size': args.gallery_size,
                           'duration_s': args.load_duration,
                           'levels': levels, 'results': results},
                          f, indent=1)

    print(json.dumps({'loadbench': out_path, 'rows': len(results)}))


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
    ap.add_argument('--load', action='store_true',
                    help='closed-loop load bench against the REAL '
                         'tools/serve.py daemon over localhost HTTP: '
                         'QPS + p50/p95/p99 vs concurrency, per mode, '
                         'plus batcher dispatch counts (VERDICT r3 #1)')
    ap.add_argument('--load-concurrency', default='1,4,16,64')
    ap.add_argument('--load-duration', type=float, default=15.0,
                    help='measured seconds per (mode, concurrency) cell')
    ap.add_argument('--load-warmup', type=float, default=4.0,
                    help='seconds discarded at the start of each cell')
    ap.add_argument('--load-modes', default='exact,rerank,ivf')
    ap.add_argument('--load-cfg',
                    default=os.path.join(
                        ROOT, 'configs', 'market1501',
                        'pps_crm_triplet_R-50_1x_int8.yaml'))
    ap.add_argument('--load-workdir', default='/root/.pps_loadbench',
                    help='fabricated index/weights/queries cache (the '
                         '4 GB npz is reused across runs)')
    ap.add_argument('--load-startup-timeout', type=float, default=2400,
                    help='seconds to wait for daemon readiness (fresh '
                         'TPU compiles can take tens of minutes)')
    args = ap.parse_args()

    if args.load:
        # the bench process must NOT touch the TPU — the daemon owns it
        run_load(args)
        return

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
