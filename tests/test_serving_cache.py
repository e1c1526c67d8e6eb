"""Gallery embedding cache (engine/serving.embed_gallery_cached):
hit on unchanged (paths, weights), re-embed on either changing.

The cache key must cover the MODEL identity, not just the path list —
matching new-model queries against stale gallery embeddings would
silently corrupt every ranking (tools/retrieve.py and tools/serve.py
both serve through this).
"""

import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

import jax

from pps_tpu.config import (cfg, merge_cfg_from_list, assert_and_infer_cfg,
                            reset_cfg)
from pps_tpu.engine import serving
from pps_tpu.models.model import build_model
from pps_tpu.parallel import mesh as mesh_lib


@pytest.fixture
def tiny(tmp_path):
    reset_cfg()
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'TEST.IMS_PER_BATCH', '2',
    ])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.build_mesh(cfg)

    gdir = str(tmp_path / 'gallery')
    os.makedirs(gdir)
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(os.path.join(gdir, 'im%d.png' % i),
                    rng.randint(0, 255, size=(96, 32, 3)).astype(np.uint8))
    weights = str(tmp_path / 'w.pkl')
    with open(weights, 'wb') as f:
        f.write(b'v1')
    return model, params, state, mesh, gdir, weights


def _counting(monkeypatch):
    calls = {'n': 0}
    real = serving.embed_paths

    def wrapper(*a, **kw):
        calls['n'] += 1
        return real(*a, **kw)

    monkeypatch.setattr(serving, 'embed_paths', wrapper)
    return calls


def test_cache_hit_and_invalidation(tiny, monkeypatch):
    model, params, state, mesh, gdir, weights = tiny
    calls = _counting(monkeypatch)

    f1, p1 = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                          mesh, weights_path=weights)
    assert calls['n'] == 1 and f1.shape[0] == 3 == len(p1)
    assert os.path.exists(os.path.join(gdir, serving.GALLERY_CACHE_NAME))

    # unchanged gallery + weights: served from cache, bit-identical
    f2, p2 = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                          mesh, weights_path=weights)
    assert calls['n'] == 1 and p2 == p1
    np.testing.assert_array_equal(f2, f1)

    # weights file changed (size+mtime) -> re-embed
    time.sleep(0.01)
    with open(weights, 'wb') as f:
        f.write(b'v2-longer')
    serving.embed_gallery_cached(cfg, model, params, state, gdir, mesh,
                                 weights_path=weights)
    assert calls['n'] == 2

    # gallery contents changed -> re-embed, new image included
    cv2.imwrite(os.path.join(gdir, 'im3.png'),
                np.zeros((96, 32, 3), np.uint8))
    f4, p4 = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                          mesh, weights_path=weights)
    assert calls['n'] == 3 and len(p4) == 4 and f4.shape[0] == 4

    # refresh flag forces a re-embed even when nothing changed
    serving.embed_gallery_cached(cfg, model, params, state, gdir, mesh,
                                 weights_path=weights, refresh=True)
    assert calls['n'] == 4


def test_corrupt_cache_reembeds(tiny, monkeypatch):
    """A truncated/corrupt cache file (crash mid-write, disk trouble)
    triggers a clean re-embed instead of crashing the daemon at load."""
    model, params, state, mesh, gdir, weights = tiny
    calls = _counting(monkeypatch)
    with open(os.path.join(gdir, serving.GALLERY_CACHE_NAME), 'wb') as f:
        f.write(b'PK\x03\x04 definitely not a whole npz')
    f1, p1 = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                          mesh, weights_path=weights)
    assert calls['n'] == 1 and f1.shape[0] == 3 == len(p1)
    # and the rewritten cache is healthy
    f2, _ = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                         mesh, weights_path=weights)
    assert calls['n'] == 1
    np.testing.assert_array_equal(f2, f1)


def test_chunked_embed_resumes_after_crash(tiny, monkeypatch):
    """Galleries above the chunk size embed resumably: a crash mid-build
    keeps the finished chunks on disk, and the retry embeds only the
    missing ones (bit-identical result to an unchunked embed)."""
    model, params, state, mesh, gdir, weights = tiny
    real = serving.embed_paths
    calls = {'n': 0}

    def crashing(*a, **kw):
        calls['n'] += 1
        if calls['n'] == 2:
            raise RuntimeError('boom mid-gallery')
        return real(*a, **kw)

    monkeypatch.setattr(serving, 'embed_paths', crashing)
    with pytest.raises(RuntimeError):
        serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                     mesh, weights_path=weights, chunk=1)
    # chunk 0 survived the crash; no final cache yet
    assert not os.path.exists(os.path.join(gdir,
                                           serving.GALLERY_CACHE_NAME))
    parts = [d for d in os.listdir(gdir)
             if d.startswith('.gallery_partial_')]
    assert len(parts) == 1
    assert len(os.listdir(os.path.join(gdir, parts[0]))) == 1

    # retry: only the two missing chunks embed (the finished one loads)
    calls2 = {'n': 0}

    def counting(*a, **kw):
        calls2['n'] += 1
        return real(*a, **kw)

    monkeypatch.setattr(serving, 'embed_paths', counting)
    f1, p1 = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                          mesh, weights_path=weights,
                                          chunk=1)
    assert calls2['n'] == 2 and f1.shape[0] == 3
    # partial dir cleaned up after the final cache lands
    assert not [d for d in os.listdir(gdir)
                if d.startswith('.gallery_partial_')]
    assert os.path.exists(os.path.join(gdir, serving.GALLERY_CACHE_NAME))
    # chunked result bitwise equals one unchunked embed of the same list
    f2 = np.asarray(real(cfg, model, params, state, p1, mesh), np.float32)
    np.testing.assert_array_equal(f1, f2)


def test_corrupt_features_member_reembeds(tiny, monkeypatch):
    """An npz whose zip directory is intact but whose 'features' member
    is bit-rotted loads paths/wkey fine and only fails at the LAZY
    features read — that read must sit inside the corruption guard too,
    or the daemon dies at startup on exactly the file the guard was
    written for (advisor r5)."""
    model, params, state, mesh, gdir, weights = tiny
    calls = _counting(monkeypatch)
    f1, _ = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                         mesh, weights_path=weights)
    assert calls['n'] == 1
    cache = os.path.join(gdir, serving.GALLERY_CACHE_NAME)
    with open(cache, 'rb') as f:
        blob = bytearray(f.read())
    at = blob.find(b'features.npy') + len('features.npy') + 128
    for j in range(at, at + 8):
        blob[j] ^= 0xFF
    with open(cache, 'wb') as f:
        f.write(bytes(blob))
    # the scenario is real: paths still read, the features member raises
    data = np.load(cache, allow_pickle=True)
    assert list(data['paths'])
    with pytest.raises(Exception):
        np.asarray(data['features'])
    f2, p2 = serving.embed_gallery_cached(cfg, model, params, state, gdir,
                                          mesh, weights_path=weights)
    assert calls['n'] == 2 and f2.shape[0] == 3 == len(p2)
    np.testing.assert_allclose(f2, f1, rtol=0, atol=0)
