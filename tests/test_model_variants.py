"""Model-level tests for every shipped config variant: the build must
succeed and produce the right embedding geometry for each head family
(pps / bpm / youtu) and all the real yaml files must construct a model."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pps_tpu.config import (cfg, reset_cfg, merge_cfg_from_file,
                            merge_cfg_from_list, assert_and_infer_cfg)
from pps_tpu.models.model import build_model

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')


def _small(head, strips, dim, extra=()):
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '7',
        'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', head,
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)',
        'REID.BPM_STRIP_NUM', str(strips),
        'REID.BPM_DIM', str(dim),
        'REID.NORMALIZE_FEATURE', 'True',
    ] + list(extra))
    assert_and_infer_cfg(make_immutable=False)
    return cfg


@pytest.mark.parametrize('head,strips,expected_combos', [
    ('pps_heads.add_pps_part_head', 3, 7),       # 2^3 - 1
    ('bpm_heads.add_uniform_part_head', 3, 3),   # one per strip
    ('youtu_heads.add_youtu_part_head', 3, 6),   # n(n+1)/2
])
def test_head_families_build_and_extract(head, strips, expected_combos):
    c = _small(head, strips, 8,
               extra=['REID.MAX_AVE_FEATURE', 'True'])
    model = build_model(c)
    assert model.num_combos == expected_combos
    assert model.embedding_dim == expected_combos * 8
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 96, 32, 3),
                    jnp.float32)
    emb = model.extract_features(params, state, x)
    assert emb.shape == (2, model.embedding_dim)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(emb, axis=1)),
                               1.0, rtol=1e-5)


def test_all_shipped_configs_build():
    yamls = sorted(glob.glob(os.path.join(CONFIG_DIR, '*', '*.yaml')))
    assert len(yamls) >= 12
    for y in yamls:
        reset_cfg()
        merge_cfg_from_file(y)
        assert_and_infer_cfg(make_immutable=False)
        model = build_model(cfg)
        # flagship geometry: 5 strips -> 31 combos x 128 = 3968
        if 'pps' in os.path.basename(y):
            assert model.num_combos == 31
            assert model.embedding_dim == 3968


def test_reference_configs_also_parse():
    """The reference's shipped yamls load unchanged (cfg compat)."""
    ref = '/root/reference/configs/market1501/pps_crm_triplet_R-50_1x.yaml'
    if not os.path.exists(ref):
        pytest.skip('reference not mounted')
    merge_cfg_from_file(ref)
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    assert model.embedding_dim == 3968
    assert cfg.REID.P == 8 and cfg.REID.K == 8


def test_gn_body_builds_and_extracts():
    """MODEL.USE_GN end-to-end: GroupNorm body (reference
    ResNet.py:223-268,340-395) + GN head; no BN state anywhere."""
    c = _small('pps_heads.add_pps_part_head', 3, 8,
               extra=['MODEL.USE_GN', 'True', 'MODEL.USE_BN', 'False',
                      'GROUP_NORM.NUM_GROUPS', '4',
                      'REID.MAX_AVE_FEATURE', 'True'])
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    assert 'conv1_gn_s' in params
    assert 'res2_0_branch2a_gn_s' in params
    assert not any('_bn_' in k for k in params)
    assert not any(k.endswith('_bn_rm') for k in state)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 96, 32, 3),
                    jnp.float32)
    emb = model.extract_features(params, state, x)
    assert emb.shape == (2, model.embedding_dim)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(emb, axis=1)),
                               1.0, rtol=1e-5)
    # GN is train/eval-identical: the train forward must agree with eval
    batch = {'data': x, 'labels_int32': np.zeros(2, np.int32),
             'labels_oh': np.zeros((2, 6), np.float32)}
    out = model.train_forward(params, state, batch, jax.random.PRNGKey(1),
                              1.0)
    assert np.isfinite(float(out[0]))


def test_affine_channel_body(tmp_path):
    """MODEL.USE_BN=False -> AffineChannel in the BODY only: no body
    running stats, y = x*s + b exactly (reference detector.py:82-109),
    trainable s/b, eval folding absorbs s into the conv and leaves
    fb == b.  The HEAD keeps real SpatialBN with running stats — the
    reference head calls model.SpatialBN directly (reid_heads.py:58),
    bypassing the USE_BN gate."""
    c = _small('pps_heads.add_pps_part_head', 3, 8,
               extra=['MODEL.USE_BN', 'False',
                      'REID.MAX_AVE_FEATURE', 'True'])
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    stat_keys = [k for k in state if k.endswith(('_rm', '_riv'))]
    assert sorted(stat_keys) == ['pps_bn_riv', 'pps_bn_rm'], stat_keys
    assert 'res2_0_branch2a_bn_s' in params  # same names as SpatialBN
    assert 'pps_bn_s' in params

    x = jnp.asarray(np.random.RandomState(0).randn(2, 96, 32, 3),
                    jnp.float32)
    emb = model.extract_features(params, state, x)
    assert emb.shape == (2, model.embedding_dim)

    # affine semantics through the module's own branch: _conv_bn in
    # train mode must be exactly conv*s + b (a BN would subtract batch
    # statistics first)
    from pps_tpu.models import resnet as resnet_lib
    x64 = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 64),
                      jnp.float32)
    got = resnet_lib._conv_bn(x64, params, state, {}, 'res2_0_branch2a',
                              train=True, spec=model.resnet_spec)
    want = (resnet_lib.conv2d(x64, params['res2_0_branch2a_w']) *
            params['res2_0_branch2a_bn_s'] +
            params['res2_0_branch2a_bn_b'])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # train forward runs, is finite, and emits no BN state updates
    batch = {'data': x, 'labels_int32': jnp.asarray([0, 1], jnp.int32),
             'labels_oh': jnp.asarray(np.eye(6, dtype=np.float32)[[0, 1]])}
    out = model.train_forward(params, state, batch, jax.random.PRNGKey(1),
                              1.0)
    assert np.isfinite(float(out[0]))

    # eval folding: w' = w*s, fb == b
    from pps_tpu.models.folding import fold_conv_bn
    folded = fold_conv_bn(params, state)
    np.testing.assert_allclose(
        np.asarray(folded['res2_0_branch2a_fb']),
        np.asarray(params['res2_0_branch2a_bn_s'] * 0.0 +
                   params['res2_0_branch2a_bn_b']))
    emb_folded = model.extract_features(folded, state, x)
    np.testing.assert_allclose(np.asarray(emb_folded), np.asarray(emb),
                               rtol=2e-3, atol=2e-3)

    # reference-pkl interop: affine-body checkpoints carry NO body
    # running stats but DO carry per-combo head SpatialBN stats
    # (reid_heads.py:58), and round-trip bitwise
    import pickle
    from pps_tpu.engine.checkpoint import save_checkpoint, load_checkpoint
    path = str(tmp_path / 'affine.pkl')
    save_checkpoint(path, model, params, state, cfg=c)
    blobs = pickle.load(open(path, 'rb'))['blobs']
    assert not any(k.startswith(('res', 'conv1')) and
                   k.endswith(('_rm', '_riv')) for k in blobs)
    assert 'pps0_bn_s' in blobs
    assert 'pps0_bn_rm' in blobs and 'pps0_bn_riv' in blobs
    p2, s2, _ = load_checkpoint(path, model, params, state)
    for k in params:
        np.testing.assert_array_equal(np.asarray(p2[k]),
                                      np.asarray(params[k]), err_msg=k)
