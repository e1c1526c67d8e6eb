"""Serving-side retrieval index: a device-resident gallery you can
search and grow.

The production counterpart of the offline evaluator: the reference's only
retrieval surface was the batch evaluator's full numpy distance matrix
(reference detectron/datasets/reid_dataset_evaluator.py:104-125, computed
once per features.pkl); it shipped nothing for interactive serving.  Here
the gallery lives on the accelerator — f32 or int8-quantized (4x less
HBM; `ops/topk.quantize_gallery`), single-device or row-sharded
over the whole mesh (`parallel/retrieval`) — and queries stream through
`streaming_topk` without ever materializing a distance matrix.

Used by `tools/retrieve.py` (one-shot CLI) and `tools/serve.py` (HTTP
daemon).  Measured single-query latency on one v5e chip: 29.7 ms
end-to-end (int8 PTQ embed + exact top-100 over a resident 1M x 3968-d
int8 gallery; BASELINE.md).
"""

import glob
import logging
import os
import queue
import threading

import numpy as np

logger = logging.getLogger(__name__)

GALLERY_CACHE_NAME = 'gallery_features.npz'

_JITTED = {}


def _jitted_take():
    """Shared jitted row-gather.  One module-level callable means jax's
    executable cache is keyed on SHAPES, not on a fresh closure per call
    site — a `jax.jit(lambda ...)` built inside a method re-traces on
    every invocation (the per-call-retrace pathology the QueryEmbedder
    docstring documents for the bulk extraction path)."""
    fn = _JITTED.get('take')
    if fn is None:
        import jax
        import jax.numpy as jnp
        fn = _JITTED['take'] = jax.jit(
            lambda a, p: jnp.take(a, p, axis=0))
    return fn


def _euclidean(a, b):
    """Evaluator-exact euclidean all-pairs (same clamped-sqrt math the
    re-rank goldens were validated against)."""
    from pps_tpu.evaluation.metrics import compute_dist
    return compute_dist(a, b, 'euclidean')


def _rerank_small(qg, qq, gg, k1, k2, lam, engine='auto'):
    """k-reciprocal re-ranking of a small candidate set.

    engine='auto' prefers the C++/OpenMP `native.rerank_native` (same
    algorithm, ~1e-5 accumulation-order diffs vs numpy, microseconds at
    shortlist scale where the numpy row loop costs ~15 ms on one core);
    'numpy' forces the golden `re_ranking` (tests pin exactness there).
    """
    if engine == 'auto':
        try:
            from pps_tpu import native
            if native.available():
                return native.rerank_native(qg, qq, gg, k1=k1, k2=k2,
                                            lambda_value=lam)
        except Exception:  # noqa: BLE001 - any native issue -> numpy
            logger.exception('native rerank failed; using numpy')
    from pps_tpu.evaluation.rerank import re_ranking
    return re_ranking(qg, qq, gg, k1=k1, k2=k2, lambda_value=lam)


def list_gallery_images(gallery_dir):
    """Sorted jpg/png paths under ``gallery_dir`` (the serving contract:
    deterministic order so cached features stay aligned)."""
    return sorted(
        glob.glob(os.path.join(gallery_dir, '*.jpg')) +
        glob.glob(os.path.join(gallery_dir, '*.png')))


def weights_cache_key(weights_path):
    """Identity of the embedding model for gallery-cache validity:
    switching --weights must re-embed, or queries embedded with the new
    model would be matched against stale gallery embeddings."""
    if weights_path and os.path.exists(weights_path):
        st = os.stat(weights_path)
        return '%s:%d:%d' % (os.path.abspath(weights_path),
                             st.st_size, int(st.st_mtime))
    return ''


def embed_paths(cfg, model, params, state, paths, mesh):
    """Embed image files through the batched extraction engine."""
    from pps_tpu.engine.test import extract_dataset_features
    roidb = [{'image': p, 'im_name': os.path.basename(p)} for p in paths]
    return extract_dataset_features(cfg, model, params, state, roidb,
                                    mesh=mesh)


class QueryEmbedder:
    """Persistent low-latency query embedding for the serving daemon.

    The bulk gallery path (`extract_dataset_features`) rebuilds its
    jitted extraction fn per call — a fresh `jax.jit` closure re-traces
    the whole model every time (~0.9 s of host work on a small host) —
    and pads every dispatch to the full eval batch, whose uint8 wire is
    ~1 s through a slow H2D link.  Right for a one-off million-image
    gallery build; wrong per request: measured per-query embed through
    it was 1.87 s where the model forward itself is ~5 ms.

    This embedder traces ONCE and keeps the jitted fns for the life of
    the daemon, and dispatches each coalesced group at the smallest
    padded batch in a geometric ladder (1, 4, 16, ... x devices, capped
    at the eval batch) so single queries ship 1 image, not 64.  jit
    specializes per padded shape, so the ladder bounds the number of
    compiled programs; `warmup()` compiles them before traffic.
    Measured single-query embed: 43 ms (vs 1.87 s), same features.

    Uniform-size decodes ride the uint8 device-preproc wire (4x fewer
    bytes, fused cv2-exact bicubic on device); mixed-size groups fall
    back to host preprocessing into the f32 wire — both persistent.
    Matches `extract_dataset_features`' feature semantics (same
    device-preproc graph, same flip-TTA flag derivation) so query
    embeddings stay consistent with cached gallery embeddings.
    """

    def __init__(self, cfg, model, params, state, mesh, max_batch=64):
        from pps_tpu.parallel import eval_step as es_lib
        self._params = params
        self._state = state
        self._mesh = mesh
        self._n_dev = int(np.prod(list(mesh.shape.values())))
        w, h = cfg.REID.SCALE
        self._out_hw = (h, w)
        self._means = np.asarray(cfg.PIXEL_MEANS)
        flip = bool(cfg.TEST.BBOX_AUG.ENABLED and cfg.TEST.BBOX_AUG.H_FLIP)
        self._fn_u8 = es_lib.make_extract_fn(
            model, mesh, flip_tta=flip,
            device_preproc=(self._means, self._out_hw))
        self._fn_f32 = es_lib.make_extract_fn(model, mesh, flip_tta=flip)
        sizes, s = [], self._n_dev
        # the extract fns shard the batch dim over the mesh, so every
        # ladder size — the cap included — must divide by the device
        # count: round a caller-supplied max_batch DOWN (floor n_dev)
        # rather than crash placement at the top-rung dispatch
        cap = max(self._n_dev,
                  int(max_batch) // self._n_dev * self._n_dev)
        while s < cap:
            sizes.append(s)
            s *= 4
        sizes.append(cap)
        self.ladder = tuple(sizes)
        self._u8_shape = None  # first raw shape pins the uint8 graph
        self._dim = None       # embedding width, learned at first dispatch

    def _ladder_pad(self, n):
        for s in self.ladder:
            if n <= s:
                return s
        return self.ladder[-1]

    def warmup(self, raw_hw=None):
        """Compile every ladder size of BOTH persistent wires before
        traffic (cache-hit cheap; a cold compile through a degraded
        compile service can take minutes and would otherwise land
        inside the embed dispatcher thread, queueing every request
        behind it).

        The f32 wire's input shape is the fixed post-preproc
        (out_h, out_w, 3) — warming it covers queries of EVERY raw
        resolution via the host-preproc fallback.  The uint8 wire
        specializes per RAW decode shape; pass ``raw_hw`` (e.g. the
        gallery's camera geometry) to warm — and pin — that shape, else
        it warms and pins at the network input size.  Either way the
        pinned shape is exactly the warmed one, so any later mismatch
        falls back to the warm f32 wire — never a cold compile inside
        the dispatcher thread."""
        h, w = (raw_hw if raw_hw is not None else self._out_hw)
        img8 = np.zeros((1, h, w, 3), np.uint8)
        oh, ow = self._out_hw
        img32 = np.zeros((1, oh, ow, 3), np.float32)
        for s in self.ladder:
            self._dispatch(self._fn_u8, np.tile(img8, (s, 1, 1, 1)), s)
            self._dispatch(self._fn_f32, np.tile(img32, (s, 1, 1, 1)), s)
        # Pin unconditionally: an unpinned shape after warmup would let the
        # first uniform-raw-shape embed pin an UNWARMED shape and compile
        # _fn_u8 cold under traffic (advisor r4, serving.py:142).
        self._u8_shape = (h, w, 3)

    def _dispatch(self, fn, stack, padded):
        n = stack.shape[0]
        if padded > n:
            stack = np.concatenate(
                [stack, np.tile(stack[-1:], (padded - n, 1, 1, 1))], axis=0)
        feats = np.asarray(fn(self._params, self._state, stack),
                           np.float32)
        self._dim = feats.shape[1]
        return feats[:n]

    def embed(self, paths, decode_fn=None):
        """[len(paths), D] f32 embeddings of image files (blocking).

        Requests larger than the ladder cap are chunked through the top
        ladder size — every dispatch stays on a pre-compiled shape, so
        one oversized /add (index.add's docstring tells operators to
        batch) can never force a fresh un-laddered XLA compile under
        traffic."""
        from pps_tpu.data import transforms
        if not paths:
            # [0, D] so callers can concatenate; D known after any
            # dispatch (warmup populates it before traffic)
            return np.zeros((0, self._dim or 0), np.float32)
        decode = decode_fn or transforms.decode_image
        ims = [decode(p) for p in paths]
        cap = self.ladder[-1]
        if len(ims) > cap:
            return np.concatenate(
                [self._embed_ims(ims[s:s + cap])
                 for s in range(0, len(ims), cap)], axis=0)
        return self._embed_ims(ims)

    def _embed_ims(self, ims):
        from pps_tpu.data import transforms
        padded = self._ladder_pad(len(ims))
        if all(im.shape == ims[0].shape for im in ims):
            # one uint8 raw shape per daemon lifetime (same rule as
            # stream_extract): the device-preproc graph specializes per
            # raw shape, and queries of arbitrary sizes must not compile
            # unbounded programs under traffic
            if self._u8_shape is None:
                self._u8_shape = ims[0].shape
            if ims[0].shape == self._u8_shape:
                return self._dispatch(self._fn_u8, np.stack(ims), padded)
        h, w = self._out_hw
        out = np.empty((len(ims), h, w, 3), np.float32)
        for i, im in enumerate(ims):
            out[i] = transforms.prep_im_for_blob(im, self._means, (w, h))
        return self._dispatch(self._fn_f32, out, padded)


def embed_gallery_cached(cfg, model, params, state, gallery_dir, mesh,
                         weights_path=None, refresh=False, chunk=8192):
    """(features [N, D] f32, paths) for a gallery directory, cached to
    ``<gallery_dir>/gallery_features.npz``.

    The cache is keyed on the exact path list AND the weights file
    (path, size, mtime) — either changing forces a re-embed.

    Galleries larger than ``chunk`` embed in resumable chunks: each
    chunk lands in ``.gallery_partial_<key>/`` as it finishes (atomic
    rename), so a crash or restart mid-way through a million-image
    build re-embeds only the missing tail instead of starting over.
    The partial dir is keyed on (paths, weights) like the final cache
    and deleted once the single-file cache is written.
    """
    import hashlib
    import shutil
    paths = list_gallery_images(gallery_dir)
    assert paths, 'no images in {}'.format(gallery_dir)
    cache = os.path.join(gallery_dir, GALLERY_CACHE_NAME)
    wkey = weights_cache_key(weights_path)
    if os.path.exists(cache) and not refresh:
        feats = None
        try:
            data = np.load(cache, allow_pickle=True)
            cached_paths = list(data['paths'])
            cached_wkey = str(data['wkey']) if 'wkey' in data else ''
            if cached_paths == paths and cached_wkey == wkey:
                # npz members decompress lazily — the features read can
                # hit a CRC/zlib error even when paths/wkey loaded fine,
                # so it must sit inside this guard too
                feats = np.asarray(data['features'], np.float32)
            else:
                logger.info('gallery or weights changed; re-embedding')
        except Exception:
            # a truncated/corrupt cache (crash mid-write predating the
            # atomic rename, disk trouble) must trigger a re-embed, not
            # kill the daemon at startup
            logger.warning('corrupt gallery cache %s; re-embedding',
                           cache)
        if feats is not None:
            return feats, paths

    part_dir = None
    if len(paths) <= chunk:
        feats = np.asarray(
            embed_paths(cfg, model, params, state, paths, mesh),
            np.float32)
    else:
        key = hashlib.md5(
            ('\n'.join(paths) + '|' + wkey).encode()).hexdigest()[:12]
        part_dir = os.path.join(gallery_dir, '.gallery_partial_' + key)
        os.makedirs(part_dir, exist_ok=True)
        parts, resumed = [], 0
        for start in range(0, len(paths), chunk):
            sub = paths[start:start + chunk]
            pf = os.path.join(part_dir, '%09d.npy' % start)
            if os.path.exists(pf) and not refresh:
                arr = np.load(pf)
                if arr.ndim == 2 and arr.shape[0] == len(sub):
                    parts.append(np.asarray(arr, np.float32))
                    resumed += len(sub)
                    continue
            arr = np.asarray(
                embed_paths(cfg, model, params, state, sub, mesh),
                np.float32)
            tmp = pf + '.tmp.npy'
            np.save(tmp, arr)  # np.save appends .npy only to bare names
            os.replace(tmp, pf)
            parts.append(arr)
            logger.info('embedded gallery chunk %d-%d / %d',
                        start, start + len(sub), len(paths))
        if resumed:
            logger.info('resumed %d previously-embedded gallery rows '
                        'from %s', resumed, part_dir)
        feats = np.concatenate(parts)

    # atomic publish (tmp + rename), and only THEN drop the resume
    # chunks: a crash anywhere before the rename leaves the old state
    # fully resumable instead of a corrupt cache with no chunks
    tmp_cache = cache + '.tmp.npz'
    with open(tmp_cache, 'wb') as f:
        np.savez(f, features=feats, paths=np.array(paths),
                 wkey=np.array(wkey))
    os.replace(tmp_cache, cache)
    if part_dir is not None:
        shutil.rmtree(part_dir, ignore_errors=True)
    logger.info('cached %d gallery embeddings to %s', len(paths), cache)
    return feats, paths


def build_index_from_args(cfg, model, params, state, mesh, *,
                          gallery=None, load_index=None, int8=False,
                          shard=False, weights_path=None, refresh=False):
    """The load-index-vs-embed-gallery bootstrap shared by the serving
    CLIs (tools/serve.py and tools/retrieve.py keep identical semantics
    by construction).  Raises ValueError when neither source is given —
    CLIs map that to parser.error()."""
    if load_index:
        if int8:
            logger.warning('--int8-gallery is ignored with --load-index: '
                           'the stored rows carry their own precision')
        return RetrievalIndex.load(load_index, mesh=mesh, shard=shard)
    if not gallery:
        raise ValueError('--gallery is required unless --load-index')
    g_feats, g_paths = embed_gallery_cached(
        cfg, model, params, state, gallery, mesh,
        weights_path=weights_path, refresh=refresh)
    return RetrievalIndex(g_feats, g_paths, mesh=mesh, int8=int8,
                          shard=shard)


class Overloaded(RuntimeError):
    """Raised by EmbedBatcher.embed when the pending queue exceeds
    ``max_pending``: the server sheds load (HTTP 503) instead of
    building an unbounded backlog whose tail latency is already lost."""


class EmbedBatcher:
    """Adaptive micro-batching for query embedding: concurrent requests
    coalesce into ONE device dispatch.

    The extraction graph pads every call to a fixed batch
    (TEST.IMS_PER_BATCH x devices — engine/test.py:207-211), so
    embedding one query costs the same device time as embedding up to
    that many; a daemon that serializes per-request embeds wastes
    (B-1)/B of every forward under concurrent load.  Continuous
    batching, no timers: while one dispatch runs, arrivals queue; the
    dispatcher then takes everything waiting (up to ``max_batch``) in
    one call.  Batching emerges exactly when there is contention and
    adds zero latency when there is none.

    A failing coalesced dispatch (e.g. one undecodable image) retries
    each request individually so the poison request fails alone.
    """

    _STOP = object()

    def __init__(self, embed_fn, max_batch=64, max_pending=None):
        self._embed = embed_fn                # list[path] -> [N, D] f32
        self.max_batch = max(1, int(max_batch))
        self.max_pending = (None if max_pending is None
                            else max(1, int(max_pending)))
        self._q = queue.Queue()
        self._closed = False
        self.dispatches = 0                   # device calls issued
        self.images = 0                       # images embedded
        self.shed = 0                         # requests refused (overload)
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name='embed-batcher')
        self._thread.start()

    def pending(self):
        """Requests queued behind the running dispatch (approximate)."""
        return self._q.qsize()

    def close(self):
        self._closed = True
        self._q.put(self._STOP)
        self._thread.join(timeout=60)

    def embed(self, paths):
        """Blocking: returns [len(paths), D] f32 (raises on bad input;
        raises Overloaded without queueing when the backlog exceeds
        ``max_pending`` or the batcher was close()d — in-flight daemon
        requests at shutdown get a 503, not a blocked-forever thread)."""
        if self._closed:
            raise Overloaded('embed batcher closed (shutting down)')
        if self.max_pending is not None and \
                self._q.qsize() >= self.max_pending:
            self.shed += 1
            raise Overloaded(
                'embed backlog at {} requests (max_pending={})'.format(
                    self._q.qsize(), self.max_pending))
        box = {'feats': None, 'err': None}
        done = threading.Event()
        self._q.put((list(paths), box, done))
        # The poll guards the enqueue-vs-close race: a request put after
        # the dispatcher consumed _STOP would otherwise wait forever.
        while not done.wait(1.0):
            if self._closed and not self._thread.is_alive():
                raise Overloaded('embed batcher closed while queued')
        if box['err'] is not None:
            raise box['err']
        return box['feats']

    def _fail_queued(self):
        """Fail every request still queued at shutdown (anything that
        raced in behind _STOP) instead of stranding its caller."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is self._STOP:
                continue
            _, box, done = item
            box['err'] = Overloaded('embed batcher closed (shutting down)')
            done.set()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is self._STOP:
                self._fail_queued()
                return
            batch = [item]
            n = len(item[0])
            while n < self.max_batch:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._q.put(nxt)  # handle shutdown after this batch
                    break
                batch.append(nxt)
                n += len(nxt[0])
            all_paths = [p for req in batch for p in req[0]]
            try:
                feats = np.asarray(self._embed(all_paths))
                self.dispatches += 1
                off = 0
                for paths, box, _ in batch:
                    box['feats'] = feats[off:off + len(paths)]
                    off += len(paths)
            except Exception as e:  # noqa: BLE001 - isolate the poison req
                if len(batch) == 1:
                    batch[0][1]['err'] = e
                else:
                    for paths, box, _ in batch:
                        try:
                            box['feats'] = np.asarray(self._embed(paths))
                            self.dispatches += 1
                        except Exception as e2:  # noqa: BLE001
                            box['err'] = e2
            finally:
                self.images += len(all_paths)
                for _, _, done in batch:
                    done.set()


class SearchBatcher:
    """Coalesces concurrent index searches into ONE device scan.

    The streaming scan's cost is the gallery READ (it is
    HBM-bandwidth-bound — BASELINE.md), which is ~flat in the number of
    query rows: scanning for 64 queries costs about the same device
    time as for 1 (the per-chunk matmul grows but stays tiny next to
    the bytes).  A daemon that serializes per-request scans therefore
    pays N x scan-time for N concurrent searches; coalescing converts
    that into ~1 x.  Same continuous-batching discipline as
    EmbedBatcher: no timers — while one scan runs, arrivals queue, and
    the dispatcher takes everything waiting in one call, so batching
    emerges exactly under contention and adds zero latency when there
    is none.

    Requests coalesce only within a GROUP KEY (k, recall_target, exact,
    rerank params): different keys need different compiled programs /
    host stages.  Coalesced batches pad their query rows up to a small
    set of bucket sizes (1, 4, 16, ..., max_batch) so each key compiles
    O(log max_batch) top-k programs instead of one per arrival count
    (each fresh nq shape would otherwise pay a full XLA compile, which
    can take minutes through a degraded compile service).
    """

    _STOP = object()

    def __init__(self, index, max_batch=64, max_pending=None):
        self.index = index
        self.max_batch = max(1, int(max_batch))
        self.max_pending = (None if max_pending is None
                            else max(1, int(max_pending)))
        self._q = queue.Queue()
        self._closed = False
        self.dispatches = 0                   # logical dispatches (one
        #   per coalesced group; an oversized group still counts once)
        self.device_scans = 0                 # real device scans issued
        #   (>= dispatches: oversized groups chunk into several scans)
        self.queries = 0                      # query rows scanned
        self.shed = 0                         # requests refused
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name='search-batcher')
        self._thread.start()

    def buckets(self):
        """The nq padding buckets: 1, 4, 16, ... capped at max_batch."""
        out, b = [], 1
        while b < self.max_batch:
            out.append(b)
            b *= 4
        out.append(self.max_batch)
        return out

    def _bucket(self, n):
        for b in self.buckets():
            if n <= b:
                return b
        return self.max_batch

    def pending(self):
        return self._q.qsize()

    def close(self):
        self._closed = True
        self._q.put(self._STOP)
        self._thread.join(timeout=60)

    def search(self, q, k, recall_target=None, exact=False, rerank=None):
        """Blocking: (dists, indices, paths) for THIS request's query
        rows; coalesced with concurrent compatible requests.

        rerank: None for the plain scan, or a dict with keys
        shortlist/k1/k2/lam/engine to route through search_reranked.
        Raises Overloaded past ``max_pending`` (the daemon sheds 503).
        """
        if self._closed:
            raise Overloaded('search batcher closed (shutting down)')
        if self.max_pending is not None and \
                self._q.qsize() >= self.max_pending:
            self.shed += 1
            raise Overloaded(
                'search backlog at {} requests (max_pending={})'.format(
                    self._q.qsize(), self.max_pending))
        q = np.asarray(q, np.float32)
        if q.ndim == 1:
            q = q[None]
        key = (int(k), recall_target, bool(exact),
               None if rerank is None else tuple(sorted(rerank.items())))
        box = {'out': None, 'err': None}
        done = threading.Event()
        self._q.put((key, q, rerank, box, done))
        while not done.wait(1.0):
            if self._closed and not self._thread.is_alive():
                raise Overloaded('search batcher closed while queued')
        if box['err'] is not None:
            raise box['err']
        return box['out']

    def _fail_queued(self):
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is self._STOP:
                continue
            item[3]['err'] = Overloaded(
                'search batcher closed (shutting down)')
            item[4].set()

    def _dispatch(self, key, group):
        k, recall_target, exact, _ = key
        rows = np.concatenate([req[1] for req in group], axis=0)
        n = rows.shape[0]
        if n > self.max_batch:
            # a client-controlled multi-row request (or coalescing
            # overshoot: _loop admits one more multi-row request past
            # the cap) must not reach the scan at a raw un-bucketed nq
            # — each fresh nq shape is a full XLA compile inside the
            # index lock.  Chunk through the warmed max bucket instead,
            # under one index snapshot so a remove() between chunks
            # cannot renumber rows mid-response (advisor r4).  For
            # rerank groups only the DEVICE phase runs under the
            # snapshot; the multi-second host k-reciprocal math runs
            # after release, or it would stall every concurrent
            # search/add/remove for pure host work.
            spans = range(0, n, self.max_batch)
            if key[3] is not None:
                rk = dict(key[3])
                s_len = max(int(rk.get('shortlist', 100)), int(k))
                with self.index.snapshot():
                    preps = [self._rerank_prepare(
                        rows[a:a + self.max_batch], s_len, recall_target)
                        for a in spans]
                chunks = [self.index.rerank_from_snapshot(
                    p_, k, k1=rk.get('k1', 20), k2=rk.get('k2', 6),
                    lambda_value=rk.get('lam', 0.3),
                    engine=rk.get('engine', 'auto'), return_paths=True)
                    for p_ in preps]
            else:
                with self.index.snapshot():
                    chunks = [self._scan(key, rows[a:a + self.max_batch])
                              for a in spans]
            d = np.concatenate([c[0] for c in chunks], axis=0)
            i = np.concatenate([c[1] for c in chunks], axis=0)
            p = [row for c in chunks for row in c[2]]
        else:
            d, i, p = self._scan(key, rows)
        self.dispatches += 1
        off = 0
        for _, qr, _, box, _ in group:
            m = qr.shape[0]
            box['out'] = (d[off:off + m], i[off:off + m],
                          p[off:off + m])
            off += m

    def _rerank_prepare(self, rows, shortlist, recall_target):
        """Bucket-padded phase-1 shortlist scan for one chunk of an
        oversized rerank group (device work + row snapshot only; the
        caller holds the index snapshot across all chunks)."""
        self.device_scans += 1
        n = rows.shape[0]
        b = self._bucket(n)
        if b > n:
            rows = np.concatenate(
                [rows, np.repeat(rows[-1:], b - n, axis=0)], axis=0)
        return self.index.rerank_shortlist_snapshot(
            rows, shortlist, recall_target=recall_target,
            return_paths=True, n_valid=n)

    def _scan(self, key, rows):
        """One device scan at a warmed bucket shape; returns results for
        the REAL rows only (pad rows never reach the host rerank)."""
        k, recall_target, exact, rerank_key = key
        self.device_scans += 1
        n = rows.shape[0]
        b = self._bucket(n)
        if b > n:  # pad to the bucket: scan cost is bytes, not rows
            rows = np.concatenate(
                [rows, np.repeat(rows[-1:], b - n, axis=0)], axis=0)
        if rerank_key is not None:
            rerank = dict(rerank_key)
            d, i, p = self.index.search_reranked(
                rows, k, shortlist=rerank.get('shortlist', 100),
                k1=rerank.get('k1', 20), k2=rerank.get('k2', 6),
                lambda_value=rerank.get('lam', 0.3),
                recall_target=recall_target,
                engine=rerank.get('engine', 'auto'), return_paths=True,
                n_valid=n)
            return d, i, p
        d, i, p = self.index.search(rows, k, recall_target=recall_target,
                                    exact=exact, return_paths=True)
        return d[:n], i[:n], p[:n]

    def _loop(self):
        while True:
            item = self._q.get()
            if item is self._STOP:
                self._fail_queued()
                return
            batch = [item]
            n = item[1].shape[0]
            while n < self.max_batch:
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is self._STOP:
                    self._q.put(nxt)
                    break
                batch.append(nxt)
                n += nxt[1].shape[0]
            # group by compatibility key; each group is one dispatch
            groups = {}
            for req in batch:
                groups.setdefault(req[0], []).append(req)
            for key, group in groups.items():
                try:
                    self._dispatch(key, group)
                except Exception as e:  # noqa: BLE001 - isolate poison
                    if len(group) == 1:
                        group[0][3]['err'] = e
                    else:
                        for req in group:
                            try:
                                self._dispatch(key, [req])
                            except Exception as e2:  # noqa: BLE001
                                req[3]['err'] = e2
                finally:
                    self.queries += sum(r[1].shape[0] for r in group)
                    for req in group:
                        req[4].set()


class RetrievalIndex:
    """Device-resident top-k retrieval over an appendable gallery.

    feats: [N, D] float embeddings; paths: the per-row identities the
    caller resolves results against (any picklable labels).
    int8: store rows int8-quantized on device (per-row symmetric scale;
    exact same math as the float path over the dequantized rows).
    shard: row-shard over ALL devices of ``mesh`` (capacity and scan
    bandwidth scale linearly with chips; exact cross-shard merge).

    ``add`` appends rows (per-row quantization means existing rows are
    untouched; unsharded placement appends on device so only the new
    rows cross the host->device link).  Each distinct gallery length
    compiles a fresh top-k program — batch adds rather than inserting
    one row at a time in a hot loop.

    Thread-safe: search/add serialize on an internal lock (one device
    stream; concurrency belongs in the batch dimension, not in racing
    dispatches).
    """

    # exact scans whose [Nq, Ng] distance row fits this many elements
    # route through ops.topk.flat_topk (one gallery read, no chunk
    # chain); bigger batches stream.  64M elems = 256 MB f32 for the
    # row (+ ~2x transients) — 64 concurrent queries at a 1M gallery,
    # the SearchBatcher's default coalescing cap.
    FLAT_SCAN_MAX_ELEMS = 64 * 1024 * 1024

    def __init__(self, feats, paths, mesh=None, int8=True, shard=False):
        import jax
        from pps_tpu.ops.topk import quantize_gallery
        self._jax = jax
        feats = np.asarray(feats, np.float32)
        assert feats.ndim == 2 and feats.shape[0] == len(paths), \
            (feats.shape, len(paths))
        if feats.shape[0] == 0:
            # an empty gallery has no searchable program (remove()
            # enforces the same invariant when draining): top-k over a
            # zero-length axis is an XLA error, so fail at construction
            # with a real message instead of inside the first search
            raise ValueError('RetrievalIndex needs at least one row; '
                             'build it from a non-empty gallery and '
                             'grow it with add()')
        self.paths = list(paths)
        self.int8 = bool(int8)
        self.shard = bool(shard)
        self.mesh = mesh
        if self.shard:
            assert mesh is not None, 'shard=True needs a mesh'
        if self.int8:
            g8, sc = quantize_gallery(feats)
            self._host_g = np.asarray(g8)
            self._host_s = np.asarray(sc, np.float32)
        else:
            self._host_g = feats
            self._host_s = None
        self._ivf = None
        self._auto_retrain = None
        # bumped on every IVF install/disable: a background re-train
        # snapshots it before the minutes-long k-means and aborts its
        # install if the index's IVF state changed underneath (operator
        # disable_ivf / manual enable_ivf during training)
        self._ivf_gen = 0
        # re-entrant: search_reranked/search(return_paths=True) hold it
        # across the scan AND the row/path resolution so a concurrent
        # remove() (which renumbers every row) cannot interleave
        self._lock = threading.RLock()
        self._place()

    def __len__(self):
        return len(self.paths)

    def snapshot(self):
        """Context manager pinning the index state (row numbering,
        centroids, paths) for the duration of a multi-call read — e.g.
        a chunked oversized search whose chunks must all see the same
        numbering even if a remove() is waiting.  Re-entrant with the
        internal lock the individual calls take."""
        return self._lock

    @property
    def dim(self):
        return int(self._host_g.shape[1])

    def _place(self):
        import jax
        self._gn = None        # row norms follow the device layout
        if self.shard and self._ivf is not None:
            self._place_ivf_sharded()
        elif self.shard:
            from pps_tpu.parallel.retrieval import shard_gallery
            self._g, self._s, self._n = shard_gallery(
                self._host_g, self.mesh, int8=self.int8,
                g_scale=self._host_s)
        elif self._ivf is not None:
            self._place_ivf()
        else:
            self._g = jax.device_put(self._host_g)
            self._s = (None if self._host_s is None
                       else jax.device_put(self._host_s))
            self._n = len(self.paths)

    # ------------------------------------------------------------------
    # IVF (inverted-file) approximate search — `ops/ivf` integration.
    #
    # Device layout while enabled: rows [0, n_sorted) are the host
    # gallery permuted cell-by-cell (`perm` maps device position back to
    # the original row id); rows [n_sorted, N) are the SPILL — appended
    # since the last (re)build, scanned exactly and merged, and folded
    # into the sorted layout once it outgrows ``spill_limit``.  The host
    # mirror stays in original row order, so remove/save/rerank logic is
    # untouched.
    # ------------------------------------------------------------------

    def _place_ivf(self, device_layout=None):
        """(Re)build the cell-sorted device placement from per-row cell
        assignments (folds any spill — every row has an assignment).

        ``device_layout``: original-row-id per CURRENT device position.
        When given (and complete), the re-sort is an on-device HBM
        gather of the already-resident rows — milliseconds — instead of
        re-transferring the multi-GB host mirror over the (slow)
        host->device link."""
        import jax
        from pps_tpu.ops.ivf import build_ivf
        self._gn = None
        ivf = self._ivf
        perm, starts = build_ivf(ivf['assign'], ivf['nlist'])
        if device_layout is not None and len(device_layout) == len(perm):
            inv = np.empty(len(device_layout), np.int64)
            inv[device_layout] = np.arange(len(device_layout))
            dev_perm = jax.device_put(inv[perm].astype(np.int32))
            take = _jitted_take()
            self._g = take(self._g, dev_perm)
            if self._s is not None:
                self._s = take(self._s, dev_perm)
        else:
            self._g = jax.device_put(self._host_g[perm])
            self._s = (None if self._host_s is None
                       else jax.device_put(self._host_s[perm]))
        ivf['perm'], ivf['starts'] = perm, starts
        # one-time transfer: starts rides into every probe dispatch
        ivf['starts_dev'] = jax.device_put(starts)
        ivf['spill_ids'] = np.zeros((0,), np.int32)
        self._n = len(self.paths)

    def _place_ivf_sharded(self):
        """Sharded IVF placement: every cell's rows dealt round-robin
        across shards (parallel/retrieval.shard_ivf_gallery), so probes
        hit the same cell set as single-device IVF while each chip reads
        only its 1/n_shards of the probed bytes."""
        import jax
        from pps_tpu.parallel.retrieval import shard_ivf_gallery
        ivf = self._ivf
        ivf['placed'] = shard_ivf_gallery(
            self._host_g, ivf['assign'], ivf['nlist'], self.mesh,
            g_scale=self._host_s)
        if not isinstance(ivf['cent'], jax.Array):
            ivf['cent'] = jax.device_put(np.asarray(ivf['cent'],
                                                    np.float32))
        # no spill segment in the sharded placement (adds re-place, as
        # the plain sharded gallery already does)
        ivf['spill_ids'] = np.zeros((0,), np.int32)
        self._g = ivf['placed']['g']
        self._s = ivf['placed']['scale']
        self._n = len(self.paths)

    def enable_ivf(self, nlist=None, nprobe=8, budget=None, iters=10,
                   seed=0, sample=262144, spill_limit=None):
        """Cluster the gallery and switch ``search`` to IVF probing.

        Cuts per-query gallery bytes by ~nlist/nprobe (the scan is
        HBM-bandwidth-bound, so bytes ARE latency) at a small recall
        cost; re-ID embeddings cluster by identity, so recall stays
        near 1 at nprobe/nlist ~ 1% (tests/test_ivf.py).  Single-device
        placement only: the sharded scan already splits bytes across
        chips, and combining both is not supported.

        nlist: cells (default `default_nlist`, ~4*sqrt(N)).
        nprobe: cells scanned per query.  budget: static candidate-row
        cap per query (default ~4x the expected rows at this nprobe).
        spill_limit: appended rows tolerated before an automatic
        re-sort (default max(4096, N/10); unsharded only — the sharded
        placement re-places on add like the plain sharded gallery).

        Composes with ``shard``: centroids stay global (identical
        recall at a given nprobe) and each cell's rows are dealt
        round-robin across shards, so capacity scales linearly AND each
        chip reads only its share of the probed bytes.
        """
        from pps_tpu.ops import ivf as ivf_ops
        # k-means runs OFF the index lock on a snapshot of the host
        # mirror (add() replaces, never mutates, the mirror arrays):
        # searches keep flowing during the minutes-scale training, and
        # only the atomic install below stalls them.  Rows appended
        # while k-means runs are assigned to the fresh centroids at
        # install (the same fixed-centroid semantics as post-install
        # adds).
        with self._lock:
            host_g, host_s = self._host_g, self._host_s
        n0 = len(host_g)
        cent = ivf_ops.kmeans(
            host_g, int(nlist) if nlist else ivf_ops.default_nlist(n0),
            iters=iters, seed=seed, g_scale=host_s, sample=sample)
        self._install_ivf(
            cent, nprobe=nprobe, budget=budget, spill_limit=spill_limit,
            train=dict(nlist=nlist, nprobe=int(nprobe), budget=budget,
                       iters=int(iters), seed=int(seed),
                       sample=int(sample), spill_limit=spill_limit))

    def _install_ivf(self, cent, nprobe, budget, spill_limit, train,
                     expect_gen=None):
        """Atomically swap in a clustering: assign every CURRENT row to
        the given centroids and re-sort the device placement, all under
        one index-lock hold (searches see either the old index or the
        new one, never a mix).  Full-gallery assignment reads the
        already-RESIDENT device rows when unsharded (no gallery
        re-transfer); the host mirror under sharding (the sharded
        layout is padded/permuted).

        ``expect_gen``: abort (return False) if ``_ivf_gen`` no longer
        matches — a background re-train trained against state that an
        operator's ``disable_ivf``/``enable_ivf`` has since replaced,
        and must not override that explicit decision.  Returns True
        when installed."""
        from pps_tpu.ops import ivf as ivf_ops
        nlist = int(np.asarray(cent).shape[0])  # clamped by kmeans
        with self._lock:
            if expect_gen is not None and self._ivf_gen != expect_gen:
                logger.info('IVF install aborted: index IVF state '
                            'changed during training (gen %d -> %d)',
                            expect_gen, self._ivf_gen)
                return False
            ng = len(self.paths)
            cur_layout = None
            if self.shard:
                assign = np.asarray(ivf_ops.assign_clusters(
                    self._host_g, cent, g_scale=self._host_s), np.int32)
            else:
                # device rows are in DEVICE-layout order (original order
                # when IVF is off; sorted+spill when re-training an
                # enabled index): map the per-position assignment back
                # to original row ids
                if self._ivf is None:
                    cur_layout = np.arange(ng, dtype=np.int64)
                else:
                    cur_layout = np.concatenate(
                        [self._ivf['perm'],
                         self._ivf['spill_ids']]).astype(np.int64)
                a_dev = np.asarray(ivf_ops.assign_clusters(
                    self._g, cent, g_scale=self._s), np.int32)
                assign = np.empty(ng, np.int32)
                assign[cur_layout] = a_dev
            if budget is None:
                budget = min(ng, max(2048, 4 * nprobe * max(ng, 1)
                                     // max(nlist, 1)))
            self._ivf = {
                'cent': cent,
                'assign': assign,
                'nlist': nlist,
                'nprobe': int(nprobe),
                'budget': int(budget),
                'spill_limit': int(spill_limit if spill_limit is not None
                                   else max(4096, ng // 10)),
                'trained_n': ng,  # rows present at install
                'train': train,   # recipe for re-training (auto or not)
            }
            if self.shard:
                self._place_ivf_sharded()
            else:
                # re-sort with an in-HBM gather of the resident rows
                self._place_ivf(device_layout=cur_layout)
            self._ivf_gen += 1
            # snapshot for logging outside the lock: a concurrent
            # disable_ivf after release must not crash the logger
            log_np, log_bg = self._ivf['nprobe'], self._ivf['budget']
        logger.info('IVF installed: %d cells, nprobe=%d, budget=%d%s',
                    nlist, log_np, log_bg,
                    ' (sharded)' if self.shard else '')
        return True

    def disable_ivf(self):
        """Back to the exact streaming scan (original row order)."""
        with self._lock:
            self._ivf = None
            self._ivf_gen += 1
            self._place()

    @property
    def ivf_enabled(self):
        return self._ivf is not None

    @property
    def ivf_staleness(self):
        """Fraction of the gallery appended since the IVF centroids were
        trained (0.0 right after ``enable_ivf``; None when IVF is off).

        Centroid-staleness policy: centroids are FIXED after
        ``enable_ivf`` — appended rows are assigned to their nearest
        existing cell (and spill-folded into the sorted layout past
        ``spill_limit``), which preserves recall as long as new rows
        come from the same embedding distribution.  When staleness
        grows (rule of thumb: > 0.25) recall on the NEW rows erodes;
        ``enable_auto_retrain`` re-trains in the background once the
        threshold is crossed (k-means OFF the index lock, atomic swap
        under it), or the operator re-trains manually by calling
        ``enable_ivf`` again.  A re-train must never run inline inside
        ``add``: a synchronous k-means there would stall every search
        behind the index lock at serving scale.
        """
        ivf = self._ivf  # snapshot: disable_ivf may null it mid-read
        if ivf is None:
            return None
        n = len(self.paths)
        return max(0.0, (n - ivf['trained_n']) / max(n, 1))

    # ------------------------------------------------------------------
    # staleness-triggered background re-training
    # ------------------------------------------------------------------

    def enable_auto_retrain(self, threshold=0.25):
        """Re-train the IVF clustering automatically once
        ``ivf_staleness`` crosses ``threshold``.

        Checked after every ``add``; at most one re-train runs at a
        time, in a daemon thread.  The expensive k-means runs on a
        host-mirror snapshot with NO lock held (searches and adds keep
        flowing); the finished clustering is swapped in atomically
        under the index lock (``_install_ivf``) with the then-current
        rows assigned to the new centroids, so staleness resets to 0
        even for rows added mid-training.
        """
        assert self._ivf is not None, 'enable_ivf before auto-retrain'
        self._auto_retrain = {'threshold': float(threshold),
                              'thread': None, 'count': 0}

    def disable_auto_retrain(self):
        self._auto_retrain = None

    @property
    def retrain_count(self):
        """Completed background re-trains (0 when auto-retrain is off)."""
        ar = self._auto_retrain
        return ar['count'] if ar else 0

    @property
    def retraining(self):
        """True while a background re-train is in flight."""
        ar = self._auto_retrain
        t = ar and ar.get('thread')
        return bool(t and t.is_alive())

    def wait_retrain(self, timeout=None):
        """Block until any in-flight background re-train finishes
        (shutdown-drain / test hook).  Returns ``retrain_count``."""
        ar = self._auto_retrain
        t = ar and ar.get('thread')
        if t is not None:
            t.join(timeout)
        return self.retrain_count

    def _maybe_auto_retrain(self):
        ar = self._auto_retrain
        if ar is None:
            return
        with self._lock:
            s = self.ivf_staleness
            if s is None or s < ar['threshold']:
                return
            t = ar.get('thread')
            if t is not None and t.is_alive():
                return  # one re-train at a time; re-checked on next add
            logger.info('IVF staleness %.3f >= %.3f: background '
                        're-train starting', s, ar['threshold'])
            t = threading.Thread(target=self._auto_retrain_run,
                                 name='ivf-auto-retrain', daemon=True)
            ar['thread'] = t
            t.start()

    def _auto_retrain_run(self):
        from pps_tpu.ops import ivf as ivf_ops
        try:
            with self._lock:
                if self._ivf is None:
                    return
                train = dict(self._ivf.get('train') or {})
                spill_cur = self._ivf['spill_limit']
                nprobe_cur = self._ivf['nprobe']
                budget_cur = self._ivf['budget']
                gen = self._ivf_gen
                host_g, host_s = self._host_g, self._host_s
            # Indices restored by load() carry operating knobs but no
            # train recipe (save() persists ivf_params, not the recipe):
            # re-train with the persisted knobs verbatim — including the
            # possibly operator-tuned budget — rather than silently
            # recomputing defaults.  A live recipe keeps its own values:
            # budget=None there means "formula default", which SHOULD
            # be recomputed for the grown gallery.
            nlist = train.get('nlist')
            cent = ivf_ops.kmeans(
                host_g,
                int(nlist) if nlist else ivf_ops.default_nlist(
                    len(host_g)),
                iters=train.get('iters', 10), seed=train.get('seed', 0),
                g_scale=host_s, sample=train.get('sample', 262144))
            installed = self._install_ivf(
                cent, nprobe=train.get('nprobe', nprobe_cur),
                budget=train.get('budget') if train else budget_cur,
                spill_limit=train.get('spill_limit', spill_cur),
                train=train or dict(nlist=None, nprobe=nprobe_cur,
                                    budget=budget_cur, iters=10, seed=0,
                                    sample=262144, spill_limit=spill_cur),
                expect_gen=gen)
            if not installed:
                return  # operator changed IVF state during training
            ar = self._auto_retrain
            if ar is not None:
                ar['count'] += 1
            logger.info('IVF auto-retrain complete (staleness reset, '
                        '%d rows)', len(self.paths))
        except Exception:
            logger.exception('IVF auto-retrain failed; index unchanged')

    def _to_orig(self, pos):
        """Device-layout positions -> original row ids (-1 passthrough).
        Identity when IVF is off (device order IS original order).

        The perm+spill concatenation is cached per placement (both
        arrays are REPLACED, never mutated, so identity is the change
        signal): rebuilding an O(N) array per exact search would cost
        ~8 MB of alloc+copy per request at 1M rows, inside the index
        lock, on the serving host."""
        ivf = self._ivf
        if ivf is None:
            return pos
        cache = ivf.get('_orig_map')
        if (cache is None or cache[0] is not ivf['perm'] or
                cache[1] is not ivf['spill_ids']):
            cache = (ivf['perm'], ivf['spill_ids'],
                     np.concatenate([ivf['perm'], ivf['spill_ids']]))
            ivf['_orig_map'] = cache
        mapping = cache[2]
        safe = np.clip(pos, 0, max(len(mapping) - 1, 0))
        return np.where(pos >= 0, mapping[safe], -1)

    def _search_ivf(self, q, k, chunk):
        """IVF probe over the sorted region + exact scan of the spill
        tail, merged on host.  Returns (dists, original row ids)."""
        from pps_tpu.ops.ivf import ivf_topk
        from pps_tpu.ops.topk import streaming_topk
        ivf = self._ivf
        n_sorted = len(ivf['perm'])
        n_spill = len(ivf['spill_ids'])
        d, pos = ivf_topk(q, self._g, ivf['cent'], ivf['starts_dev'],
                          k=min(k, max(n_sorted, 1)),
                          nprobe=ivf['nprobe'], budget=ivf['budget'],
                          g_scale=self._s)
        d, pos = np.asarray(d), np.asarray(pos)
        safe = np.clip(pos, 0, max(n_sorted - 1, 0))
        ids = np.where(pos >= 0, ivf['perm'][safe], -1)
        if n_spill:
            sp_d, sp_p = streaming_topk(
                q, self._g[n_sorted:], k=min(k, n_spill), chunk=chunk,
                g_scale=None if self._s is None else self._s[n_sorted:])
            sp_d, sp_p = np.asarray(sp_d), np.asarray(sp_p)
            sp_ids = np.where(sp_p >= 0, ivf['spill_ids'][
                np.clip(sp_p, 0, n_spill - 1)], -1)
            d = np.concatenate([d, sp_d], axis=1)
            ids = np.concatenate([ids, sp_ids], axis=1)
        sel = np.argsort(d, axis=1, kind='stable')[:, :k]
        return (np.take_along_axis(d, sel, axis=1),
                np.take_along_axis(ids, sel, axis=1))

    def _paths_of(self, idxs):
        """[[path or None per column] per query] — call under _lock."""
        return [[self.paths[int(j)] if 0 <= int(j) < len(self.paths)
                 else None for j in row] for row in idxs]

    def search(self, q_feats, k, recall_target=None, chunk=4096,
               return_paths=False, exact=False):
        """Returns (dists [Nq, k'], indices [Nq, k']) with
        k' = min(k, len(index)); indices index into ``self.paths``.

        With IVF enabled (``enable_ivf``) the scan probes only the
        nearest cells (approximate; ``recall_target`` is ignored — cell
        selection is the approximation knob); ``exact=True`` forces the
        full streaming scan regardless.

        return_paths=True additionally returns the matched paths
        resolved UNDER THE INDEX LOCK — the only race-safe way to map
        indices to paths when another thread may remove() rows (which
        renumbers everything after the removed positions)."""
        from pps_tpu.ops.topk import streaming_topk
        q = np.asarray(q_feats, np.float32)
        if q.ndim == 1:
            q = q[None]
        assert q.shape[1] == self.dim, (q.shape, self.dim)
        with self._lock:
            k_req = max(1, min(int(k), self._n))
            # Bucket k to the next power of two (clamped to the
            # gallery): the top-k programs are jit-static in k, so a
            # client sweeping k values would otherwise force a cold XLA
            # compile — minutes on a degraded compile service — INSIDE
            # this lock per distinct k.  Bucketing bounds the program
            # set at log2(N); results are sliced back to k_req below.
            k = min(self._n, 1 << (k_req - 1).bit_length())
            if self.shard and self._ivf is not None:
                from pps_tpu.parallel.retrieval import sharded_ivf_topk
                ivf = self._ivf
                d, i = sharded_ivf_topk(
                    q, ivf['cent'], ivf['placed'], k=k,
                    nprobe=ivf['nprobe'], budget=ivf['budget'],
                    chunk=chunk, mesh=self.mesh, exact=exact)
                d, i = np.asarray(d), np.asarray(i)
            elif self.shard:
                from pps_tpu.parallel.retrieval import sharded_topk
                d, i = sharded_topk(q, self._g, ng_total=self._n, k=k,
                                    chunk=chunk,
                                    recall_target=recall_target,
                                    g_scale=self._s, mesh=self.mesh)
                d, i = np.asarray(d), np.asarray(i)
            elif self._ivf is not None and not exact:
                d, i = self._search_ivf(q, k, chunk)
            elif q.shape[0] * self._n <= self.FLAT_SCAN_MAX_ELEMS:
                # small-batch exact scan: one dot over the resident
                # gallery beats the streaming scan's sequential chunk
                # chain ~5x at nq=1 (6.06 ms vs 29.5 ms at 1M x 3968-d
                # int8 — BASELINE.md shootout); exact results satisfy
                # any recall_target.  Gated on the [Nq, Ng] distance
                # row's footprint; big extraction batches stream.
                from pps_tpu.ops.topk import flat_topk, gallery_norms
                if self._gn is None:
                    self._gn = gallery_norms(self._g, self._s)
                d, i = flat_topk(q, self._g, k=k, g_scale=self._s,
                                 g_norm=self._gn)
                # device layout is cell-sorted under IVF: map back
                d, i = np.asarray(d), self._to_orig(np.asarray(i))
            else:
                d, i = streaming_topk(q, self._g, k=k, chunk=chunk,
                                      recall_target=recall_target,
                                      g_scale=self._s)
                # device layout is cell-sorted under IVF: map back
                d, i = np.asarray(d), self._to_orig(np.asarray(i))
            d, i = d[:, :k_req], i[:, :k_req]
            if return_paths:
                return d, i, self._paths_of(i)
            return d, i

    def _rows_f32(self, idx):
        """Dequantized f32 gallery rows for an index array (host side)."""
        rows = self._host_g[idx].astype(np.float32)
        if self._host_s is not None:
            rows *= self._host_s[idx][:, None]
        return rows

    def search_reranked(self, q_feats, k, shortlist=100, k1=20, k2=6,
                        lambda_value=0.3, recall_target=None, chunk=4096,
                        engine='auto', return_paths=False, n_valid=None):
        """Two-stage retrieval: device top-``shortlist``, then k-reciprocal
        re-ranking (Zhong et al., the reference evaluator's method —
        reference detectron/datasets/reid_dataset_evaluator.py:442-519) of
        the candidate set, returning the top ``k`` by blended distance.

        This carries the reference's headline re-ranked retrieval quality
        into the serving path at ANY gallery scale: the O(N) stage is the
        streaming top-k scan, and the O(S^2) k-reciprocal math runs on the
        ~100-row shortlist only.  Each query is re-ranked independently
        (one HTTP request must not change another's ranking), on the host:
        at S~100 the candidate set is ~40 KB and numpy finishes in
        microseconds — device dispatch latency would dominate, so the
        golden `evaluation.rerank.re_ranking` math is the right engine
        here (the device `rerank_distmat_jax` exists for Market-scale
        offline eval where the set does not fit the host comfortably);
        ``engine='auto'`` runs it through the C++/OpenMP native port
        when built (microseconds vs ~15 ms/query for the numpy row loop
        on one core), 'numpy' forces the golden implementation.

        With ``shortlist >= len(index)`` the result is exactly the global
        single-query re-ranking (tested).  Returns (dists [Nq, k'],
        indices [Nq, k']) like ``search``; distances are the blended
        jaccard/original values (smaller = better), NOT euclidean.

        ``n_valid``: only the first ``n_valid`` query rows are real (the
        rest are bucket padding from the SearchBatcher, there so the
        device shortlist scan runs at a pre-compiled shape) — the
        per-row host rerank skips them and the outputs have ``n_valid``
        rows.
        """
        s = max(int(shortlist), int(k))
        prep = self.rerank_shortlist_snapshot(
            q_feats, s, recall_target=recall_target, chunk=chunk,
            return_paths=return_paths, n_valid=n_valid)
        return self.rerank_from_snapshot(
            prep, k, k1=k1, k2=k2, lambda_value=lambda_value,
            engine=engine, return_paths=return_paths)

    def rerank_shortlist_snapshot(self, q_feats, shortlist,
                                  recall_target=None, chunk=4096,
                                  return_paths=False, n_valid=None):
        """Phase 1 of ``search_reranked``, under the index lock: device
        top-``shortlist`` scan plus a host snapshot of the candidate
        rows/paths per query.  Returns an opaque prep dict consumed by
        ``rerank_from_snapshot``.

        The split exists for lock discipline: a concurrent remove()
        renumbers rows, so the scan and the row/path resolution must
        share one lock hold — but the O(S^2) k-reciprocal math (phase
        2) can take ~15 ms/query on one host core, and holding the
        index lock across it would stall every concurrent search for
        pure host work (measured: tools/bench_serving.py --load).
        Batch callers composing several phase-1 calls into one
        consistent view hold ``snapshot()`` across them and run phase 2
        after releasing it (SearchBatcher._dispatch)."""
        q = np.asarray(q_feats, np.float32)
        if q.ndim == 1:
            q = q[None]
        nq_real = q.shape[0] if n_valid is None else min(int(n_valid),
                                                         q.shape[0])
        with self._lock:
            d0, i0 = self.search(q, int(shortlist),
                                 recall_target=recall_target,
                                 chunk=chunk)
            snaps = []
            for qi in range(nq_real):
                cand = i0[qi][i0[qi] >= 0]
                rows = self._rows_f32(cand) if cand.size else None
                cpaths = None
                if return_paths:
                    cpaths = [self.paths[int(j)]
                              if 0 <= int(j) < len(self.paths) else None
                              for j in cand]
                snaps.append((cand, rows, cpaths))
        return {'q': q, 'snaps': snaps, 'ncols': i0.shape[1],
                'nq_real': nq_real}

    def rerank_from_snapshot(self, prep, k, k1=20, k2=6,
                             lambda_value=0.3, engine='auto',
                             return_paths=False):
        """Phase 2 of ``search_reranked``: the per-query k-reciprocal
        math over a phase-1 snapshot.  Pure host work — call it OUTSIDE
        the index lock."""
        q, snaps = prep['q'], prep['snaps']
        nq_real = prep['nq_real']
        kk = min(int(k), prep['ncols'])
        out_d = np.full((nq_real, kk), np.inf, np.float32)
        out_i = np.full((nq_real, kk), -1, np.int64)
        out_p = [[None] * kk for _ in range(nq_real)]
        for qi, (cand, rows, cpaths) in enumerate(snaps):
            if cand.size == 0:
                continue
            qrow = q[qi:qi + 1]
            qg = _euclidean(qrow, rows)
            gg = _euclidean(rows, rows)
            qq = np.zeros((1, 1), np.float32)
            c_k1 = min(int(k1), cand.size)
            c_k2 = max(1, min(int(k2), c_k1))
            rr = _rerank_small(qg, qq, gg, c_k1, c_k2,
                               float(lambda_value), engine=engine)[0]
            order = np.argsort(rr, kind='stable')[:kk]
            out_d[qi, :order.size] = rr[order]
            out_i[qi, :order.size] = cand[order]
            if return_paths:
                for r, o in enumerate(order):
                    out_p[qi][r] = cpaths[int(o)]
        if return_paths:
            return out_d, out_i, out_p
        return out_d, out_i

    def remove(self, paths):
        """Drop every row whose path is in ``paths``; returns the number
        of rows removed.  Removal re-places the gallery from the host
        mirror (O(gallery) — rows must stay contiguous for the streaming
        scan), so batch removals like adds.  Refuses to empty the index
        entirely (an empty gallery has no searchable program; tear the
        server down instead).
        """
        drop = set(paths)
        with self._lock:
            keep = np.fromiter((p not in drop for p in self.paths),
                               bool, count=len(self.paths))
            removed = int((~keep).sum())
            if removed == 0:
                return 0
            if keep.sum() == 0:
                raise ValueError('remove would empty the gallery '
                                 '({} rows)'.format(removed))
            self._host_g = np.ascontiguousarray(self._host_g[keep])
            if self._host_s is not None:
                self._host_s = np.ascontiguousarray(self._host_s[keep])
            self.paths = [p for p, k in zip(self.paths, keep) if k]
            if self._ivf is not None:
                # assignments survive removal (centroids unchanged);
                # _place -> _place_ivf re-sorts the kept rows
                self._ivf['assign'] = np.ascontiguousarray(
                    self._ivf['assign'][keep])
            self._place()
        logger.info('removed %d rows; gallery now %d', removed,
                    len(self.paths))
        return removed

    def save(self, path):
        """Persist the index to one ``.npz`` — the STORED (possibly int8)
        rows, not the f32 features, so a 1M x 3968-d int8 index is ~4 GB
        on disk instead of 15.9 GB and ``load`` skips both the embed and
        the re-quantize.  Written atomically (tmp + rename): a crashed
        save never leaves a truncated index for the next startup.
        """
        with self._lock:
            payload = {'gallery': self._host_g,
                       'paths': np.array(self.paths, dtype=object),
                       'int8': np.array(self.int8)}
            if self._host_s is not None:
                payload['scale'] = self._host_s
            if self._ivf is not None:
                # centroids + per-row assignments make the clustering
                # portable: load re-sorts without re-running k-means
                payload['ivf_cent'] = np.asarray(self._ivf['cent'],
                                                 np.float32)
                payload['ivf_assign'] = self._ivf['assign']
                payload['ivf_params'] = np.array(
                    [self._ivf['nprobe'], self._ivf['budget'],
                     self._ivf['spill_limit'],
                     self._ivf['trained_n']], np.int64)
            tmp = path + '.tmp.npz'
            with open(tmp, 'wb') as f:
                np.savez(f, **payload)
            os.replace(tmp, path)
        logger.info('saved %d x %d index (%s) to %s', len(self.paths),
                    self.dim, 'int8' if self.int8 else 'f32', path)

    @classmethod
    def load(cls, path, mesh=None, shard=False):
        """Rebuild an index from ``save`` output and place it on device.

        int8-ness travels with the file (the stored rows ARE the index);
        only the placement (``mesh``/``shard``) is the caller's choice.
        """
        data = np.load(path, allow_pickle=True)
        int8 = bool(data['int8'])
        self = cls.__new__(cls)
        import jax
        self._jax = jax
        self.paths = list(data['paths'])
        self.int8 = int8
        self.shard = bool(shard)
        self.mesh = mesh
        if self.shard:
            assert mesh is not None, 'shard=True needs a mesh'
        self._host_g = np.ascontiguousarray(
            data['gallery'], np.int8 if int8 else np.float32)
        self._host_s = (np.ascontiguousarray(data['scale'], np.float32)
                        if int8 else None)
        assert self._host_g.ndim == 2 and \
            self._host_g.shape[0] == len(self.paths), \
            (self._host_g.shape, len(self.paths))
        self._ivf = None
        if 'ivf_cent' in data:
            import jax
            cent = np.asarray(data['ivf_cent'], np.float32)
            iv = [int(v) for v in data['ivf_params']]
            nprobe, budget, spill_limit = iv[:3]
            # files written before the staleness metric carry 3 params:
            # treat their rows as all-trained (staleness restarts at 0)
            trained_n = iv[3] if len(iv) > 3 else len(self.paths)
            self._ivf = {
                'cent': jax.device_put(cent),
                'assign': np.ascontiguousarray(data['ivf_assign'],
                                               np.int32),
                'nlist': int(cent.shape[0]),
                'nprobe': nprobe, 'budget': budget,
                'spill_limit': spill_limit,
                'trained_n': trained_n,
            }
        self._auto_retrain = None
        self._ivf_gen = 0
        self._lock = threading.RLock()
        self._place()
        logger.info('loaded %d x %d index (%s) from %s', len(self.paths),
                    self.dim, 'int8' if int8 else 'f32', path)
        return self

    def add(self, feats, paths):
        """Append rows to the gallery.

        Unsharded: appends ON DEVICE (`jnp.concatenate` of the resident
        array with just the new rows) — only the new rows cross the
        host->device link, an HBM-to-HBM copy re-lays the rest.  Sharded:
        the row distribution over shards changes, so the gallery is
        re-placed from the host copy (O(gallery) transfer) — batch adds
        rather than appending one row at a time at serving scale.
        """
        import jax
        import jax.numpy as jnp
        from pps_tpu.ops.topk import quantize_gallery
        feats = np.asarray(feats, np.float32)
        if feats.ndim == 1:
            feats = feats[None]
        assert feats.shape[0] == len(paths) and feats.shape[1] == self.dim
        with self._lock:
            n_before = len(self.paths)
            if self.int8:
                g8, sc = quantize_gallery(feats)
                new_g = np.asarray(g8)
                new_s = np.asarray(sc, np.float32)
                self._host_g = np.concatenate([self._host_g, new_g])
                self._host_s = np.concatenate([self._host_s, new_s])
            else:
                new_g, new_s = feats, None
                self._host_g = np.concatenate([self._host_g, feats])
            self.paths.extend(paths)
            if self._ivf is not None:
                # assign the new rows to their cells (tiny matmul; the
                # centroids are fixed)
                from pps_tpu.ops.ivf import assign_clusters
                new_a = assign_clusters(new_g, self._ivf['cent'],
                                        g_scale=new_s)
                self._ivf['assign'] = np.concatenate(
                    [self._ivf['assign'], np.asarray(new_a, np.int32)])
            if self.shard:
                self._place()
            else:
                new_g_dev = jax.device_put(new_g)
                new_s_dev = (None if new_s is None
                             else jax.device_put(new_s))
                self._g = jnp.concatenate([self._g, new_g_dev])
                if new_s_dev is not None:
                    self._s = jnp.concatenate([self._s, new_s_dev])
                if self._gn is not None:
                    # keep the cached row norms warm: only the new rows
                    # are reduced (a cold rebuild re-reads the gallery)
                    from pps_tpu.ops.topk import gallery_norms
                    self._gn = jnp.concatenate(
                        [self._gn, gallery_norms(new_g_dev, new_s_dev)])
                self._n = len(self.paths)
                if self._ivf is not None:
                    # new rows join the spill tail (scanned exactly and
                    # merged); fold into the sorted layout once the tail
                    # outgrows spill_limit
                    ivf = self._ivf
                    ivf['spill_ids'] = np.concatenate(
                        [ivf['spill_ids'],
                         np.arange(n_before, len(self.paths),
                                   dtype=np.int32)])
                    if len(ivf['spill_ids']) > ivf['spill_limit']:
                        logger.info('IVF spill at %d rows; re-sorting',
                                    len(ivf['spill_ids']))
                        # rows are all on device (sorted + spill tail):
                        # fold with an HBM gather, not a host transfer
                        self._place_ivf(device_layout=np.concatenate(
                            [ivf['perm'], ivf['spill_ids']]))
        # outside the lock: may spawn a background re-train thread
        self._maybe_auto_retrain()
