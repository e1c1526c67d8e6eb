"""SearchBatcher (engine/serving.py): continuous micro-batching of
concurrent gallery scans into one device dispatch — coalescing, group
keys, bucket padding, poison isolation, shed, shutdown.

Pure threading tests against a stub index (the device-facing behavior
rides the real RetrievalIndex in test_serve.py's daemon e2e).
"""

import contextlib
import threading
import time

import numpy as np
import pytest

from pps_tpu.engine.serving import Overloaded, SearchBatcher


class StubIndex:
    """Returns per-row results derived from the query value so each
    caller can verify it got ITS rows back; records every dispatch."""

    def __init__(self):
        self.calls = []          # (kind, nq, k)
        self.gate = threading.Event()
        self.hold_first = False
        self.in_snapshot = False
        self.snapshot_scans = 0  # scans issued while snapshot() was held

    @contextlib.contextmanager
    def snapshot(self):
        self.in_snapshot = True
        try:
            yield
        finally:
            self.in_snapshot = False

    def _answer(self, q, k):
        q = np.asarray(q)
        d = np.tile(q[:, :1], (1, k)).astype(np.float32)
        i = np.tile(np.round(q[:, :1]).astype(np.int64), (1, k))
        p = [['p%d' % int(round(row[0]))] * k for row in q]
        return d, i, p

    def search(self, q, k, recall_target=None, exact=False,
               return_paths=False, chunk=4096):
        self.calls.append(('search', np.asarray(q).shape[0], k))
        self.snapshot_scans += int(self.in_snapshot)
        if self.hold_first and len(self.calls) == 1:
            self.gate.wait(20)
        if np.any(np.asarray(q) < 0):
            raise ValueError('poison query')
        d, i, p = self._answer(q, k)
        return (d, i, p) if return_paths else (d, i)

    def search_reranked(self, q, k, shortlist=100, k1=20, k2=6,
                        lambda_value=0.3, recall_target=None,
                        engine='auto', return_paths=False, chunk=4096,
                        n_valid=None):
        q = np.asarray(q)
        nv = q.shape[0] if n_valid is None else int(n_valid)
        self.calls.append(('rerank', q.shape[0], k, nv))
        self.snapshot_scans += int(self.in_snapshot)
        if self.hold_first and len(self.calls) == 1:
            self.gate.wait(20)
        d, i, p = self._answer(q[:nv], k)
        return (d, i, p) if return_paths else (d, i)


def test_coalesces_concurrent_searches_into_one_scan():
    idx = StubIndex()
    idx.hold_first = True
    b = SearchBatcher(idx, max_batch=16)
    try:
        results = {}

        def worker(v):
            q = np.full((1, 4), float(v), np.float32)
            results[v] = b.search(q, k=3)

        first = threading.Thread(target=worker, args=(99,))
        first.start()
        time.sleep(0.3)  # dispatcher held inside the first scan
        rest = [threading.Thread(target=worker, args=(i,))
                for i in range(6)]
        for t in rest:
            t.start()
        time.sleep(0.3)
        idx.gate.set()
        first.join(20)
        for t in rest:
            t.join(20)

        # every caller got ITS rows/paths back
        for v in [99] + list(range(6)):
            d, i, p = results[v]
            assert d.shape == (1, 3) and int(i[0, 0]) == v
            assert p[0][0] == 'p%d' % v
        # the 6 queued requests rode ONE dispatch...
        assert len(idx.calls) == 2, idx.calls
        # ...padded up to the bucket size above 6 (buckets 1,4,16)
        assert idx.calls[1] == ('search', 16, 3), idx.calls
        assert b.dispatches == 2 and b.queries == 7
    finally:
        b.close()


def test_incompatible_keys_do_not_coalesce():
    idx = StubIndex()
    idx.hold_first = True
    b = SearchBatcher(idx, max_batch=16)
    try:
        outs = {}

        def go(name, **kw):
            outs[name] = b.search(np.ones((1, 4), np.float32), **kw)

        first = threading.Thread(target=go, args=('warm',), kwargs={'k': 2})
        first.start()
        time.sleep(0.3)
        ts = [threading.Thread(target=go, args=('k3a',), kwargs={'k': 3}),
              threading.Thread(target=go, args=('k3b',), kwargs={'k': 3}),
              threading.Thread(target=go, args=('k5',), kwargs={'k': 5}),
              threading.Thread(target=go, args=('rr',),
                               kwargs={'k': 3, 'rerank': {'shortlist': 8}})]
        for t in ts:
            t.start()
        time.sleep(0.3)
        idx.gate.set()
        first.join(20)
        for t in ts:
            t.join(20)
        # k=3 pair coalesced; k=5 and the rerank ran separately
        kinds = sorted(idx.calls[1:])
        assert kinds == [('rerank', 1, 3, 1), ('search', 1, 5),
                         ('search', 4, 3)], idx.calls
        assert outs['k5'][0].shape == (1, 5)
        assert outs['rr'][0].shape == (1, 3)
    finally:
        b.close()


def test_multi_row_request_and_result_split():
    idx = StubIndex()
    b = SearchBatcher(idx, max_batch=8)
    try:
        q = np.array([[2.0] * 4, [5.0] * 4], np.float32)
        d, i, p = b.search(q, k=2)
        assert d.shape == (2, 2)
        assert [int(i[0, 0]), int(i[1, 0])] == [2, 5]
        assert p[0][0] == 'p2' and p[1][0] == 'p5'
    finally:
        b.close()


def test_poison_request_fails_alone():
    idx = StubIndex()
    idx.hold_first = True
    b = SearchBatcher(idx, max_batch=16)
    try:
        results, errors = {}, {}

        def worker(name, v):
            try:
                results[name] = b.search(
                    np.full((1, 4), float(v), np.float32), k=2)
            except Exception as e:  # noqa: BLE001
                errors[name] = e

        first = threading.Thread(target=worker, args=('warm', 7))
        first.start()
        time.sleep(0.3)
        ts = [threading.Thread(target=worker, args=('ok1', 1)),
              threading.Thread(target=worker, args=('bad', -3)),
              threading.Thread(target=worker, args=('ok2', 2))]
        for t in ts:
            t.start()
        time.sleep(0.3)
        idx.gate.set()
        first.join(20)
        for t in ts:
            t.join(20)
        assert 'bad' in errors and isinstance(errors['bad'], ValueError)
        assert int(results['ok1'][1][0, 0]) == 1
        assert int(results['ok2'][1][0, 0]) == 2
    finally:
        b.close()


def test_shed_at_max_pending_and_close_refuses():
    idx = StubIndex()
    idx.hold_first = True
    b = SearchBatcher(idx, max_batch=1, max_pending=2)
    try:
        errors = {}

        def worker(v):
            try:
                b.search(np.full((1, 4), float(v), np.float32), k=2)
            except Overloaded as e:
                errors[v] = e

        first = threading.Thread(target=worker, args=(0,))
        first.start()
        time.sleep(0.3)
        q1 = threading.Thread(target=worker, args=(1,))
        q2 = threading.Thread(target=worker, args=(2,))
        q1.start()
        q2.start()
        time.sleep(0.3)
        worker(3)  # backlog full -> shed immediately
        assert 3 in errors and b.shed == 1
        idx.gate.set()
        first.join(20)
        q1.join(20)
        q2.join(20)
    finally:
        b.close()
    with pytest.raises(Overloaded):
        b.search(np.ones((1, 4), np.float32), k=2)


def test_buckets_shape():
    idx = StubIndex()
    b = SearchBatcher(idx, max_batch=64)
    try:
        assert b.buckets() == [1, 4, 16, 64]
        b2 = SearchBatcher(idx, max_batch=10)
        assert b2.buckets() == [1, 4, 10]
        b2.close()
    finally:
        b.close()


def test_oversized_request_chunks_through_warmed_buckets():
    """A client-controlled multi-row request larger than max_batch must
    never reach the scan at a raw un-bucketed nq (each fresh nq shape is
    a full XLA compile inside the index lock): it chunks through the max
    bucket, and every caller row still comes back in order."""
    idx = StubIndex()
    b = SearchBatcher(idx, max_batch=4)
    try:
        q = np.arange(10, dtype=np.float32)[:, None] * np.ones(
            (1, 4), np.float32)
        d, i, p = b.search(q, k=2)
        assert d.shape == (10, 2)
        assert [int(v) for v in i[:, 0]] == list(range(10))
        assert [row[0] for row in p] == ['p%d' % v for v in range(10)]
        # 3 scans: 4 + 4 + 2->padded-to-4; every nq is a warmed bucket
        assert [c[1] for c in idx.calls] == [4, 4, 4], idx.calls
        assert b.dispatches == 1  # one logical dispatch for the caller
        assert b.device_scans == 3  # telemetry counts the real scans
        # all 3 chunks ran under ONE index snapshot: a remove() between
        # chunks cannot renumber rows mid-response (advisor r4)
        assert idx.snapshot_scans == 3, idx.snapshot_scans
    finally:
        b.close()


def test_coalescing_overshoot_stays_on_bucket_shapes():
    """_loop admits one more multi-row request past max_batch; the
    overshoot must chunk to bucket shapes, not dispatch at nq=5."""
    idx = StubIndex()
    idx.hold_first = True
    b = SearchBatcher(idx, max_batch=4)
    try:
        results = {}

        def worker(name, rows):
            q = np.asarray(rows, np.float32)[:, None] * np.ones(
                (1, 4), np.float32)
            results[name] = b.search(q, k=2)

        first = threading.Thread(target=worker, args=('warm', [9.0]))
        first.start()
        time.sleep(0.3)
        ts = [threading.Thread(target=worker, args=('a', [1.0, 2.0, 3.0])),
              threading.Thread(target=worker, args=('b', [4.0, 5.0]))]
        for t in ts:
            t.start()
        time.sleep(0.3)
        idx.gate.set()
        first.join(20)
        for t in ts:
            t.join(20)
        # 5 coalesced rows chunk as 4 + 1; no call sees nq=5
        assert all(c[1] in (1, 4) for c in idx.calls), idx.calls
        assert [int(v) for v in results['a'][1][:, 0]] == [1, 2, 3]
        assert [int(v) for v in results['b'][1][:, 0]] == [4, 5]
    finally:
        b.close()


def test_rerank_groups_do_not_rerank_pad_rows():
    """Bucket padding is free for the device scan but NOT for the
    O(S^2) host rerank (~15 ms/query on one core): the batcher must
    tell search_reranked how many rows are real."""
    idx = StubIndex()
    idx.hold_first = True
    b = SearchBatcher(idx, max_batch=16)
    try:
        results = {}

        def worker(v):
            q = np.full((1, 4), float(v), np.float32)
            results[v] = b.search(q, k=2, rerank={'shortlist': 8})

        first = threading.Thread(target=worker, args=(7,))
        first.start()
        time.sleep(0.3)
        ts = [threading.Thread(target=worker, args=(i,))
              for i in range(2)]
        for t in ts:
            t.start()
        time.sleep(0.3)
        idx.gate.set()
        first.join(20)
        for t in ts:
            t.join(20)
        for v in (7, 0, 1):
            assert int(results[v][1][0, 0]) == v
        # the coalesced pair padded its SCAN to bucket 4 but reranked
        # only the 2 real rows
        rr = [c for c in idx.calls if c[0] == 'rerank']
        assert rr == [('rerank', 1, 2, 1), ('rerank', 4, 2, 2)], idx.calls
    finally:
        b.close()
