"""Sharded-gallery retrieval: multi-chip top-k equals the single-device
streaming path over the concatenated gallery (8-device CPU mesh).

Beyond-reference surface (the reference's retrieval is a single-host
numpy distmat, reference reid_dataset_evaluator.py:104-125); correctness
bar is bit-parity of indices and distances with `streaming_topk` on the
unsharded gallery.
"""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from pps_tpu.ops.pallas.topk import quantize_gallery, streaming_topk
from pps_tpu.parallel.retrieval import shard_gallery, sharded_topk


def _mesh(shape=(4, 2)):
    devs = np.asarray(jax.devices()[:shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, ('data', 'model'))


def _rand(ng, d, seed=0):
    rng = np.random.RandomState(seed)
    g = rng.randn(ng, d).astype(np.float32)
    q = rng.randn(7, d).astype(np.float32)
    return q, g


@pytest.mark.parametrize('ng', [1024, 1003])  # even and uneven splits
def test_sharded_exact_matches_single_device(ng):
    q, g = _rand(ng, 32)
    mesh = _mesh()
    gd, sd, n = shard_gallery(g, mesh, int8=False)
    assert sd is None and n == ng
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=10, chunk=128, mesh=mesh)
    d_r, i_r = streaming_topk(q, g, k=10, chunk=128)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-5,
                               atol=1e-5)


def test_sharded_int8_matches_single_device_int8():
    q, g = _rand(1003, 48, seed=1)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    mesh = _mesh()
    gd, sd, n = shard_gallery(g, mesh, int8=True)
    assert gd.dtype == np.int8 and sd is not None
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=10, chunk=256,
                            g_scale=sd, mesh=mesh)
    g8, sc = quantize_gallery(g)
    d_r, i_r = streaming_topk(q, g8, k=10, chunk=256, g_scale=sc)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-5,
                               atol=1e-5)


def test_k_larger_than_shard_rows():
    # 8 shards x 8 rows; k=20 forces the merge to pull from many shards
    q, g = _rand(64, 16, seed=2)
    mesh = _mesh()
    gd, _, n = shard_gallery(g, mesh, int8=False)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=20, chunk=8, mesh=mesh)
    d_r, i_r = streaming_topk(q, g, k=20, chunk=64)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_r), rtol=1e-5,
                               atol=1e-5)


def test_k_larger_than_gallery():
    q, g = _rand(5, 16, seed=3)  # fewer rows than shards: some shards empty
    mesh = _mesh()
    gd, _, n = shard_gallery(g, mesh, int8=False)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=5, chunk=4, mesh=mesh)
    full = np.linalg.norm(q[:, None] - g[None], axis=2)
    order = np.argsort(full, axis=1)
    np.testing.assert_array_equal(np.asarray(i_s), order)
    # no pad row ever leaks out
    assert np.asarray(i_s).max() < n


def test_approx_path_runs_and_overlaps_exact():
    q, g = _rand(4096, 24, seed=4)
    mesh = _mesh()
    gd, _, n = shard_gallery(g, mesh, int8=False)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=10, chunk=512,
                            recall_target=0.95, mesh=mesh)
    _, i_r = streaming_topk(q, g, k=10, chunk=512)
    i_s, i_r = np.asarray(i_s), np.asarray(i_r)
    recall = np.mean([len(set(a) & set(b)) / 10.0
                      for a, b in zip(i_s, i_r)])
    assert recall >= 0.95
    assert i_s.max() < n and i_s.min() >= 0


def test_flat_one_axis_mesh():
    q, g = _rand(777, 16, seed=5)
    devs = np.asarray(jax.devices()).reshape(8)
    mesh = Mesh(devs, ('data',))
    gd, sd, n = shard_gallery(g, mesh, int8=True)
    d_s, i_s = sharded_topk(q, gd, ng_total=n, k=7, g_scale=sd, mesh=mesh)
    g8, sc = quantize_gallery(g)
    d_r, i_r = streaming_topk(q, g8, k=7, g_scale=sc)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_r))
