"""Serving daemon e2e: tools/serve.py in a subprocess on the CPU mesh.

Drives the full HTTP surface — healthz, search (raw image bytes),
search_path, add (gallery growth), stats — against a tiny synthetic
gallery.  Beyond-reference surface (the reference shipped no serving
path; its retrieval is the offline evaluator's one-shot numpy distmat,
reference reid_dataset_evaluator.py:104-125), so the correctness bar is
self-retrieval: a query that IS a gallery image must rank itself first.
"""

import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from test_cli import CFG_YAML, N_IDS, _write_images_and_json  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _req(url, data=None, headers=None, timeout=120):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read().decode('utf-8'))


def test_serve_daemon_e2e(tmp_path):
    _write_images_and_json(str(tmp_path / 'data'))
    imdir = str(tmp_path / 'data' / 'market1501' / 'images')
    cfg_file = str(tmp_path / 'tiny.yaml')
    with open(cfg_file, 'w') as f:
        f.write(CFG_YAML.format(nc=N_IDS + 1))

    env = dict(os.environ)
    env['PPS_TPU_DATA_DIR'] = str(tmp_path / 'data')
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

    # random-init checkpoint (the CLI contract needs no training)
    ckpt = str(tmp_path / 'model.pkl')
    mk = ("import jax; jax.config.update('jax_platforms','cpu');"
          "from pps_tpu.config import cfg, merge_cfg_from_file,"
          "assert_and_infer_cfg;"
          "merge_cfg_from_file(r'%s'); assert_and_infer_cfg("
          "make_immutable=False);"
          "from pps_tpu.models.model import build_model;"
          "from pps_tpu.engine.checkpoint import save_checkpoint;"
          "m = build_model(cfg); p, s = m.init(jax.random.PRNGKey(0));"
          "save_checkpoint(r'%s', m, p, s)" % (cfg_file, ckpt))
    proc = subprocess.run([sys.executable, '-c', mk], capture_output=True,
                          text=True, timeout=300, cwd=ROOT, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    gallery_imgs = sorted(p for p in os.listdir(imdir)
                          if p.endswith('.png'))
    n_gallery = len(gallery_imgs)
    ready = str(tmp_path / 'ready')
    log = open(str(tmp_path / 'serve.log'), 'w')
    idx_file = str(tmp_path / 'index.npz')
    server = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, 'tools', 'serve.py'),
         '--cfg', cfg_file, '--weights', ckpt, '--gallery', imdir,
         '--port', '0', '--int8-gallery', '--topk', '3',
         '--ready-file', ready, '--save-index', idx_file,
         '--max-body-mb', '1', '--ivf', '--ivf-nprobe', '4',
         '--ivf-auto-retrain', '0.2'],
        stdout=log, stderr=log, cwd=ROOT, env=env)
    try:
        deadline = time.time() + 480
        while not os.path.exists(ready):
            assert server.poll() is None, (
                'server died:\n' + open(str(tmp_path / 'serve.log')).read())
            assert time.time() < deadline, 'server never became ready'
            time.sleep(1.0)
        host, port = open(ready).read().split()
        base = 'http://{}:{}'.format(host, port)

        # healthz reflects the placed gallery
        h = _req(base + '/healthz')
        assert h['status'] == 'ok'
        assert h['gallery_size'] == n_gallery
        assert h['int8'] is True and h['sharded'] is False
        # daemon 1 clusters the gallery: every search below rides the
        # IVF probe + spill-merge path
        assert h['ivf'] is True

        # search with raw image bytes: a gallery image finds itself
        query = gallery_imgs[0]
        with open(os.path.join(imdir, query), 'rb') as f:
            raw = f.read()
        r = _req(base + '/search?k=3', data=raw,
                 headers={'Content-Type': 'image/png'})
        assert len(r['results']) == 3
        assert os.path.basename(r['results'][0]['path']) == query
        assert r['results'][0]['distance'] < r['results'][-1]['distance']
        assert r['latency_ms'] > 0
        assert r['reranked'] is False

        # rerank=1: k-reciprocal re-ranking of the shortlist; the
        # self-match must stay rank-1 and the flag must round-trip
        r = _req(base + '/search?k=3&rerank=1&shortlist=8', data=raw,
                 headers={'Content-Type': 'image/png'})
        assert r['reranked'] is True
        assert len(r['results']) == 3
        assert os.path.basename(r['results'][0]['path']) == query

        # search_path: two queries in one request
        q2 = [os.path.join(imdir, gallery_imgs[1]),
              os.path.join(imdir, gallery_imgs[2])]
        r = _req(base + '/search_path',
                 data=json.dumps({'paths': q2, 'k': 2}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert len(r['results']) == 2
        for qi, qpath in enumerate(q2):
            assert r['results'][qi][0]['path'] == qpath

        # multi-query pooling: the two paths pool into ONE query (the
        # evaluator's multi-query protocol) -> a single ranked list
        r = _req(base + '/search_path',
                 data=json.dumps({'paths': q2, 'k': 2,
                                  'multi': True}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert len(r['results']) == 1 and len(r['results'][0]) == 2

        # unknown pool type is a 400, not a crash
        try:
            _req(base + '/search_path',
                 data=json.dumps({'paths': q2, 'multi': True,
                                  'pool': 'median'}).encode(),
                 headers={'Content-Type': 'application/json'})
            assert False, 'expected HTTP 400'
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert 'pool' in json.loads(e.read().decode())['error']

        # add: a NEW image (outside the gallery dir) becomes findable
        new_img = str(tmp_path / 'newcomer.png')
        rng = np.random.RandomState(99)
        cv2.imwrite(new_img,
                    rng.randint(0, 255, size=(96, 32, 3)).astype(np.uint8))
        r = _req(base + '/add',
                 data=json.dumps({'paths': [new_img]}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r == {'added': 1, 'gallery_size': n_gallery + 1}
        r = _req(base + '/search_path',
                 data=json.dumps({'path': new_img, 'k': 1}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r['results'][0][0]['path'] == new_img

        # error contract: missing file -> 404 JSON, server keeps serving
        try:
            _req(base + '/search_path',
                 data=json.dumps({'path': '/no/such.jpg'}).encode(),
                 headers={'Content-Type': 'application/json'})
            assert False, 'expected HTTP 404'
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert 'no such file' in json.loads(
                e.read().decode())['error']

        # a JSON-string "paths" is rejected, not iterated char-by-char
        try:
            _req(base + '/search_path',
                 data=json.dumps({'paths': q2[0]}).encode(),
                 headers={'Content-Type': 'application/json'})
            assert False, 'expected HTTP 400'
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert 'list' in json.loads(e.read().decode())['error']

        # keep-alive: an error reply on an unknown POST path must drain
        # the request body, or the next request on the SAME connection
        # parses leftover bytes as its request line
        import http.client
        conn = http.client.HTTPConnection(host, int(port), timeout=60)
        conn.request('POST', '/nope', body=b'x' * 4096,
                     headers={'Content-Type': 'application/json'})
        assert conn.getresponse().read() and True
        conn.request('GET', '/healthz')
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, body
        assert json.loads(body.decode())['status'] == 'ok'
        conn.close()

        s = _req(base + '/stats')
        assert s['requests'] >= 10 and s['gallery_size'] == n_gallery + 1
        assert s['errors'] >= 4
        assert s['adds'] == 1
        # only searches feed the latency percentiles (5 so far)
        assert s['latency_ms']['count'] == 5

        # concurrency hammer: parallel clients racing mixed search
        # flavors against an /add — every reply must be a correct
        # ranking (embed+search serialize on the server's device lock;
        # index growth must never corrupt in-flight searches)
        import threading
        errors = []

        def client(j):
            try:
                qp = os.path.join(imdir, gallery_imgs[j % n_gallery])
                for flavor in ({}, {'rerank': True, 'shortlist': 8},
                               {'multi': True}):
                    body = dict(flavor)
                    body.update({'paths': [qp], 'k': 2})
                    rr = _req(base + '/search_path',
                              data=json.dumps(body).encode(),
                              headers={'Content-Type':
                                       'application/json'})
                    assert rr['results'][0][0]['path'] == qp, (flavor, rr)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        def adder():
            try:
                _req(base + '/add',
                     data=json.dumps({'paths': [new_img]}).encode(),
                     headers={'Content-Type': 'application/json'})
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=client, args=(j,))
                   for j in range(6)] + [threading.Thread(target=adder)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        h = _req(base + '/healthz')
        assert h['gallery_size'] == n_gallery + 2  # both adds landed

        # the embed micro-batcher accounts for every embedded image;
        # under the hammer, concurrent embeds coalesce into fewer
        # device dispatches than images
        e = _req(base + '/stats')['embed']
        assert e['images'] >= e['dispatches'] >= 1
        assert e['avg_batch'] >= 1.0
        assert e['pending'] == 0 and e['shed'] == 0

        # the search micro-batcher routed every non-multi gallery scan
        # (plain + rerank flavors above); same accounting invariants
        se = _req(base + '/stats')['search']
        assert se['queries'] >= se['dispatches'] >= 1
        assert se['avg_batch'] >= 1.0
        assert se['pending'] == 0 and se['shed'] == 0

        # oversized body: refused with 413 (drained, keep-alive intact —
        # the daemon was started with --max-body-mb 1)
        try:
            _req(base + '/search?k=1', data=b'x' * (2 * 1024 * 1024),
                 headers={'Content-Type': 'image/jpeg'})
            assert False, 'expected HTTP 413'
        except urllib.error.HTTPError as err:
            assert err.code == 413
            assert 'exceeds limit' in json.loads(
                err.read().decode())['error']
        # ... and the daemon keeps serving
        assert _req(base + '/healthz')['status'] == 'ok'

        # chunked Transfer-Encoding: refused with 411 + Connection:
        # close (no chunked decoder; replying with undrained frames in
        # the socket would poison keep-alive for the NEXT request)
        conn = http.client.HTTPConnection(host, int(port), timeout=60)
        conn.putrequest('POST', '/search?k=1')
        conn.putheader('Transfer-Encoding', 'chunked')
        conn.endheaders()
        conn.send(b'5\r\nhello\r\n0\r\n\r\n')
        resp = conn.getresponse()
        assert resp.status == 411, resp.status
        assert resp.getheader('Connection') == 'close'
        resp.read()
        conn.close()
        # ... and the daemon keeps serving on a fresh connection
        assert _req(base + '/healthz')['status'] == 'ok'

        # /metrics: Prometheus text exposition of the same counters
        mreq = urllib.request.Request(base + '/metrics')
        with urllib.request.urlopen(mreq, timeout=60) as resp:
            assert resp.headers['Content-Type'].startswith('text/plain')
            text = resp.read().decode()
        for name in ('pps_serve_requests_total', 'pps_serve_gallery_size',
                     'pps_serve_embed_dispatches_total',
                     'pps_serve_search_latency_ms_p50'):
            assert name in text, text
        assert 'pps_serve_gallery_size %d' % (n_gallery + 2) in text

        # /remove drops ALL rows for a path (the newcomer rode two
        # /adds) and searches stop returning it
        r = _req(base + '/remove',
                 data=json.dumps({'paths': [new_img]}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r == {'removed': 2, 'gallery_size': n_gallery}
        r = _req(base + '/search_path',
                 data=json.dumps({'path': new_img, 'k': 1}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r['results'][0][0]['path'] != new_img
        # re-add once so the restart block below sees it persisted
        r = _req(base + '/add',
                 data=json.dumps({'paths': [new_img]}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r['gallery_size'] == n_gallery + 1
        s = _req(base + '/stats')
        assert s['removes'] == 1 and s['adds'] == 3
        # staleness has not crossed --ivf-auto-retrain 0.2 yet
        assert s['ivf_retrains'] == 0

        # staleness-triggered background re-train: /add enough new rows
        # to cross the threshold, then /stats reports the completed
        # re-train and a reset staleness while searches keep working
        m = n_gallery // 3 + 1
        bulk = []
        for j in range(m):
            p = str(tmp_path / ('bulk%02d.png' % j))
            cv2.imwrite(p, np.random.RandomState(500 + j).randint(
                0, 255, size=(96, 32, 3)).astype(np.uint8))
            bulk.append(p)
        r = _req(base + '/add',
                 data=json.dumps({'paths': bulk}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r['added'] == m
        deadline_rt = time.time() + 120
        while True:
            s = _req(base + '/stats')
            if s['ivf_retrains'] >= 1 and not s['ivf_retraining']:
                break
            assert time.time() < deadline_rt, (
                'auto-retrain never fired: %r' % s)
            time.sleep(0.5)
        assert s['ivf_staleness'] == 0.0
        r = _req(base + '/search_path',
                 data=json.dumps({'path': bulk[0], 'k': 1}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r['results'][0][0]['path'] == bulk[0]
        # restore the gallery for the restart block below
        r = _req(base + '/remove',
                 data=json.dumps({'paths': bulk}).encode(),
                 headers={'Content-Type': 'application/json'})
        assert r['gallery_size'] == n_gallery + 1
    finally:
        server.terminate()
        try:
            server.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server.kill()
        log.close()

    # restart from the persisted index: no --gallery, no re-embed —
    # the daemon must come up serving the SAME placed rows (including
    # the /add'ed newcomer) straight from RetrievalIndex.load
    assert os.path.exists(idx_file), 'first daemon never wrote the index'
    ready2 = str(tmp_path / 'ready2')
    log2 = open(str(tmp_path / 'serve2.log'), 'w')
    server2 = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, 'tools', 'serve.py'),
         '--cfg', cfg_file, '--weights', ckpt, '--port', '0',
         '--topk', '3', '--ready-file', ready2,
         '--load-index', idx_file, '--shard-gallery'],
        stdout=log2, stderr=log2, cwd=ROOT, env=env)
    try:
        deadline = time.time() + 480
        while not os.path.exists(ready2):
            assert server2.poll() is None, (
                'server2 died:\n' +
                open(str(tmp_path / 'serve2.log')).read())
            assert time.time() < deadline, 'server2 never became ready'
            time.sleep(1.0)
        host, port = open(ready2).read().split()
        base = 'http://{}:{}'.format(host, port)

        h = _req(base + '/healthz')
        # the post-remove re-add persisted via the graceful-shutdown save
        assert h['gallery_size'] == n_gallery + 1
        assert h['int8'] is True  # precision travels with the file
        # daemon 2 row-shards the loaded index over the 8-device mesh;
        # the stored IVF composes with sharding (cells dealt
        # round-robin across shards), so it survives the restart
        assert h['sharded'] is True
        assert h['ivf'] is True

        with open(os.path.join(imdir, gallery_imgs[0]), 'rb') as f:
            raw = f.read()
        r = _req(base + '/search?k=3', data=raw,
                 headers={'Content-Type': 'image/png'})
        assert os.path.basename(r['results'][0]['path']) == gallery_imgs[0]
    finally:
        server2.terminate()
        try:
            server2.wait(timeout=30)
        except subprocess.TimeoutExpired:
            server2.kill()
        log2.close()
