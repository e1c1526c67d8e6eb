"""EmbedBatcher (engine/serving.py): continuous micro-batching of
concurrent embed requests into one device dispatch — coalescing,
ordering, max-batch cap, poison-request isolation, shutdown.

Pure threading tests (the embed_fn is a stub): the device-facing
behavior is covered by the daemon e2e in test_serve.py.
"""

import threading
import time

import numpy as np

from pps_tpu.engine.serving import EmbedBatcher


def _row(p):
    return [float(int(p)), float(int(p)) + 0.5]


def test_coalesces_waiting_requests_into_one_dispatch():
    calls = []
    gate = threading.Event()

    def fake(paths):
        calls.append(list(paths))
        if len(calls) == 1:
            gate.wait(20)  # hold dispatch 1 while the others queue
        return np.array([_row(p) for p in paths], np.float32)

    b = EmbedBatcher(fake, max_batch=16)
    try:
        results = {}

        def worker(i):
            results[i] = b.embed([str(i)])

        first = threading.Thread(target=worker, args=(99,))
        first.start()
        time.sleep(0.3)  # dispatcher is now blocked inside fake()
        rest = [threading.Thread(target=worker, args=(i,))
                for i in range(6)]
        for t in rest:
            t.start()
        time.sleep(0.3)  # let all 6 enqueue behind the running dispatch
        gate.set()
        first.join(20)
        for t in rest:
            t.join(20)

        # every caller got ITS rows back
        np.testing.assert_array_equal(results[99][0], _row('99'))
        for i in range(6):
            np.testing.assert_array_equal(results[i][0], _row(str(i)))
        # the 6 queued requests rode ONE dispatch
        assert len(calls) == 2, calls
        assert sorted(len(c) for c in calls) == [1, 6], calls
        assert b.dispatches == 2 and b.images == 7
    finally:
        b.close()


def test_max_batch_caps_coalescing():
    calls = []
    gate = threading.Event()

    def fake(paths):
        calls.append(list(paths))
        if len(calls) == 1:
            gate.wait(20)
        return np.array([_row(p) for p in paths], np.float32)

    b = EmbedBatcher(fake, max_batch=3)
    try:
        threads = [threading.Thread(target=b.embed, args=(['%d' % i],))
                   for i in range(9)]
        threads[0].start()
        time.sleep(0.3)
        for t in threads[1:]:
            t.start()
        time.sleep(0.3)
        gate.set()
        for t in threads:
            t.join(20)
        assert all(len(c) <= 3 for c in calls), calls
        assert sum(len(c) for c in calls) == 9
    finally:
        b.close()


def test_poison_request_fails_alone():
    def fake(paths):
        if 'bad' in paths:
            raise ValueError('cannot decode bad')
        return np.array([_row(p) for p in paths], np.float32)

    gate = threading.Event()
    calls = []

    def gated(paths):
        calls.append(list(paths))
        if len(calls) == 1:
            gate.wait(20)
        return fake(paths)

    b = EmbedBatcher(gated, max_batch=16)
    try:
        results, errors = {}, {}

        def worker(key, paths):
            try:
                results[key] = b.embed(paths)
            except Exception as e:  # noqa: BLE001
                errors[key] = e

        first = threading.Thread(target=worker, args=('warm', ['7']))
        first.start()
        time.sleep(0.3)
        ts = [threading.Thread(target=worker, args=('ok1', ['1'])),
              threading.Thread(target=worker, args=('bad', ['bad'])),
              threading.Thread(target=worker, args=('ok2', ['2']))]
        for t in ts:
            t.start()
        time.sleep(0.3)
        gate.set()
        first.join(20)
        for t in ts:
            t.join(20)

        # the coalesced dispatch failed; each request retried alone —
        # good requests succeed, only the poison one raises
        assert 'bad' in errors and isinstance(errors['bad'], ValueError)
        np.testing.assert_array_equal(results['ok1'][0], _row('1'))
        np.testing.assert_array_equal(results['ok2'][0], _row('2'))
        np.testing.assert_array_equal(results['warm'][0], _row('7'))
    finally:
        b.close()


def test_multi_path_request_and_close():
    b = EmbedBatcher(
        lambda paths: np.array([_row(p) for p in paths], np.float32))
    out = b.embed(['3', '1', '4'])
    np.testing.assert_array_equal(out,
                                  np.array([_row('3'), _row('1'),
                                            _row('4')], np.float32))
    b.close()
    assert not b._thread.is_alive()


def test_embed_after_close_fails_fast():
    """A closed batcher must refuse new work immediately (the daemon
    maps Overloaded to HTTP 503), not enqueue behind the consumed stop
    sentinel and block the handler thread forever."""
    import pytest
    from pps_tpu.engine.serving import Overloaded
    b = EmbedBatcher(
        lambda paths: np.array([_row(p) for p in paths], np.float32))
    b.close()
    with pytest.raises(Overloaded):
        b.embed(['1'])


def test_request_queued_behind_stop_is_failed():
    """A request that races into the queue behind the stop sentinel is
    failed by the exiting dispatcher instead of stranding its caller."""
    from pps_tpu.engine.serving import Overloaded
    gate = threading.Event()

    def fake(paths):
        gate.wait(20)
        return np.array([_row(p) for p in paths], np.float32)

    b = EmbedBatcher(fake, max_batch=1)
    ok = {}
    first = threading.Thread(
        target=lambda: ok.setdefault('r', b.embed(['0'])))
    first.start()
    time.sleep(0.3)  # dispatcher is held inside fake()
    closer = threading.Thread(target=b.close)
    closer.start()  # puts _STOP behind the held dispatch
    time.sleep(0.2)
    # a straggler races in BEHIND the stop sentinel (bypassing the
    # _closed fast-path, as a real racing thread could)
    box = {'feats': None, 'err': None}
    done = threading.Event()
    b._q.put((['9'], box, done))
    gate.set()
    first.join(20)
    closer.join(70)
    assert done.wait(5), 'straggler was stranded'
    assert isinstance(box['err'], Overloaded), box
    np.testing.assert_array_equal(ok['r'][0], _row('0'))


def test_load_shedding_at_max_pending():
    from pps_tpu.engine.serving import Overloaded
    gate = threading.Event()
    calls = []

    def fake(paths):
        calls.append(list(paths))
        if len(calls) == 1:
            gate.wait(20)
        return np.array([_row(p) for p in paths], np.float32)

    b = EmbedBatcher(fake, max_batch=1, max_pending=2)
    try:
        results, errors = {}, {}

        def worker(i):
            try:
                results[i] = b.embed([str(i)])
            except Overloaded as e:
                errors[i] = e

        first = threading.Thread(target=worker, args=(0,))
        first.start()
        time.sleep(0.3)  # dispatcher holds request 0 inside fake()
        # two more fill the queue to max_pending
        q1 = threading.Thread(target=worker, args=(1,))
        q2 = threading.Thread(target=worker, args=(2,))
        q1.start()
        q2.start()
        time.sleep(0.3)
        # the backlog is full: this caller is shed immediately, unqueued
        worker(3)
        assert 3 in errors and isinstance(errors[3], Overloaded)
        assert b.shed == 1
        gate.set()
        first.join(20)
        q1.join(20)
        q2.join(20)
        # everyone who got in completed normally
        for i in (0, 1, 2):
            np.testing.assert_array_equal(results[i][0], _row(str(i)))
    finally:
        b.close()


# ---------------------------------------------------------------------------
# QueryEmbedder (engine/serving.py): the persistent per-request embed
# path the daemon dispatches through.  Correctness contract: its
# features must MATCH the bulk gallery extraction path (embed_paths)
# on the same files — queries are compared against gallery embeddings
# produced by the bulk path, so any divergence is a retrieval bug.
# ---------------------------------------------------------------------------

def _embedder_fixture(tmp_path):
    import cv2
    import jax
    from test_parallel import _tiny_cfg
    from pps_tpu.models.model import build_model
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.engine.serving import QueryEmbedder, embed_paths

    c = _tiny_cfg()
    mesh = mesh_lib.build_mesh(c, mesh_shape=(2, 1))
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(3)
    paths = []
    for i, shape in enumerate([(48, 24, 3)] * 4 + [(60, 30, 3)] * 2):
        p = str(tmp_path / ('im%d.png' % i))
        cv2.imwrite(p, rng.randint(0, 255, shape, dtype=np.uint8))
        paths.append(p)
    qe = QueryEmbedder(c, model, params, state, mesh, max_batch=8)
    bulk = np.asarray(embed_paths(c, model, params, state, paths, mesh))
    return qe, paths, bulk


def test_query_embedder_matches_bulk_extraction(tmp_path):
    qe, paths, bulk = _embedder_fixture(tmp_path)
    assert qe.ladder == (2, 8)
    qe.warmup()

    # single query: uint8 device-preproc wire, padded to ladder size 2
    one = qe.embed(paths[:1])
    assert one.shape == (1, bulk.shape[1])
    np.testing.assert_allclose(one, bulk[:1], atol=1e-5)

    # group of 3 uniform-size images: one dispatch, pad rows dropped
    three = qe.embed(paths[:3])
    np.testing.assert_allclose(three, bulk[:3], atol=1e-5)

    # mixed-size group falls back to host preprocessing (f32 wire) and
    # still matches the bulk path on the same files
    mixed = qe.embed([paths[0], paths[4]])
    np.testing.assert_allclose(
        mixed, bulk[[0, 4]], atol=1e-4)


def test_query_embedder_chunks_oversized_requests(tmp_path):
    """A request larger than the ladder cap (e.g. one big /add) chunks
    through the top ladder size: every dispatch stays on a pre-compiled
    shape — no un-laddered batch ever reaches jit — and the features
    still match the bulk path row for row."""
    qe, paths, bulk = _embedder_fixture(tmp_path)
    assert qe.ladder == (2, 8)
    big = [paths[i % 4] for i in range(11)]  # uniform raw shape, n > 8
    out = qe.embed(big)
    assert out.shape == (11, bulk.shape[1])
    np.testing.assert_allclose(out, bulk[[i % 4 for i in range(11)]],
                               atol=1e-5)

    # warmup(raw_hw=...) pins the uint8 wire to the gallery geometry
    qe2, paths2, _ = _embedder_fixture(tmp_path)
    qe2.warmup(raw_hw=(48, 24))
    assert qe2._u8_shape == (48, 24, 3)


def test_query_embedder_pins_one_uint8_shape(tmp_path):
    qe, paths, bulk = _embedder_fixture(tmp_path)
    # first uniform dispatch pins the uint8 graph to (48, 24, 3)
    qe.embed(paths[:1])
    assert qe._u8_shape == (48, 24, 3)
    # a uniform group at a DIFFERENT raw shape must not compile a second
    # uint8 program: it rides the f32 host-preproc fallback, same result
    other = qe.embed(paths[4:6])
    assert qe._u8_shape == (48, 24, 3)
    np.testing.assert_allclose(other, bulk[4:6], atol=1e-4)
