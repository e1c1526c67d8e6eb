"""FPN_reid multi-scale variant tests (reference FPN_reid.py + shared-head
PPS pps_heads.py:106-142)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.models import fpn as fpn_lib
from pps_tpu.models.model import build_model


def _fpn_cfg(fpn_num=3, num_classes=9):
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'FPN_reid.add_fpn_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', str(num_classes),
        'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'FPN.FPN_ON', 'True',
        'FPN.DIM', '32',
        'RESNETS.RES5_STRIDE', '1',
        'TRAIN.FREEZE_AT', '0',
        'TRAIN.IMS_PER_BATCH', '4',
        'REID.SCALE', '(64, 192)',
        'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8',
        'REID.CRM', 'True',
        'REID.FPN_SHARED', 'True',
        'REID.FPN_NUM', str(fpn_num),
        'REID.NORMALIZE_FEATURE', 'True',
        'REID.MAX_AVE_FEATURE', 'True',
    ])
    assert_and_infer_cfg(make_immutable=False)
    return cfg


def test_fpn_spec_levels():
    c = _fpn_cfg(fpn_num=4)
    spec = fpn_lib.fpn_spec(c, depth=50)
    assert spec['blobs'] == ['res5_2_sum', 'res4_5_sum', 'res3_3_sum',
                             'res2_2_sum']
    assert spec['dims'] == [2048, 1024, 512, 256]
    assert spec['spatial_scales'] == [1 / 16., 1 / 16., 1 / 8., 1 / 4.]


def test_fpn_pyramid_shapes():
    c = _fpn_cfg(fpn_num=4)
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    # res2 (dim 256 == ... no: FPN.DIM=32 here so every level has a lateral)
    assert 'fpn_inner_res5_2_sum_w' in params
    assert 'fpn_inner_res4_5_sum_lateral_w' in params
    assert 'fpn_inner_res2_2_sum_lateral_w' in params

    from pps_tpu.models import resnet as resnet_lib
    x = jnp.asarray(np.random.RandomState(0).randn(2, 192, 64, 3),
                    jnp.float32)
    _, stages, _ = resnet_lib.apply_resnet(params, state, x,
                                           model.resnet_spec, train=False,
                                           return_stages=True)
    pyramid, _ = fpn_lib.apply_fpn(params, state, stages, model.fpn_spec,
                                   train=False)
    # input 192x64 -> res5/res4 at 1/16 = 12x4, res3 at 1/8 = 24x8,
    # res2 at 1/4 = 48x16
    assert pyramid[0].shape == (2, 12, 4, 32)
    assert pyramid[1].shape == (2, 12, 4, 32)
    assert pyramid[2].shape == (2, 24, 8, 32)
    assert pyramid[3].shape == (2, 48, 16, 32)


def test_fpn_lateral_identity_when_dims_match():
    """res2 at 256 == FPN.DIM 256 passes through with no lateral conv
    (reference FPN_reid.py:298-300)."""
    c = _fpn_cfg(fpn_num=4)
    c.FPN.DIM = 256
    model = build_model(c)
    params, _ = model.init(jax.random.PRNGKey(0))
    assert 'fpn_inner_res2_2_sum_lateral_w' not in params
    assert 'fpn_inner_res3_3_sum_lateral_w' in params


def test_fpn_train_and_test_paths():
    c = _fpn_cfg(fpn_num=3)
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = rng.randn(4, 192, 64, 3).astype(np.float32)

    # test path: level-0 only -> standard embedding size
    emb = model.extract_features(params, state, jnp.asarray(images))
    assert emb.shape == (4, model.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               rtol=1e-5)

    # train path: loss over level-concat batch with tiled labels
    labels = np.array([0, 0, 1, 1], np.int32)
    oh = np.zeros((4, 8), np.float32)
    oh[np.arange(4), labels] = 1
    batch = {'data': images, 'labels_int32': labels, 'labels_oh': oh}
    loss, (updates, logs) = model.train_forward(
        params, state, batch, jax.random.PRNGKey(1), jnp.float32(1.0))
    assert np.isfinite(float(loss))
    # grads flow to fpn + head + backbone
    grads = jax.grad(lambda p: model.train_forward(
        p, state, batch, jax.random.PRNGKey(1), jnp.float32(1.0))[0])(params)
    assert float(jnp.max(jnp.abs(
        grads['fpn_inner_res5_2_sum_w']))) > 0
    assert float(jnp.max(jnp.abs(grads['conv1_w']))) > 0


def test_fpn_gn_coarsest_only():
    """FPN.USE_GN swaps only the COARSEST 1x1 to ConvGN — bias-free conv
    + GroupNorm with NO ReLU (reference FPN_reid.py:145-159); laterals
    always stay Conv+SpatialBN+ReLU (FPN_reid.py:340-347: the lateral
    module has no GN branch)."""
    c = _fpn_cfg(fpn_num=3)
    c.FPN.USE_GN = True
    c.GROUP_NORM.NUM_GROUPS = 8
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    # coarsest: ConvGN naming, no conv bias, no BN anything
    assert 'fpn_inner_res5_2_sum_gn_s' in params
    assert 'fpn_inner_res5_2_sum_b' not in params
    assert 'fpn_inner_res5_2_sum_bn_s' not in params
    assert 'fpn_inner_res5_2_sum_bn_rm' not in state
    # laterals: real SpatialBN with running stats, never GN
    assert 'fpn_inner_res4_5_sum_lateral_bn_s' in params
    assert 'fpn_inner_res4_5_sum_lateral_bn_rm' in state
    assert 'fpn_inner_res4_5_sum_lateral_gn_s' not in params

    from pps_tpu.models import resnet as resnet_lib
    x = jnp.asarray(np.random.RandomState(0).randn(2, 192, 64, 3),
                    jnp.float32)
    emb = model.extract_features(params, state, x)
    assert emb.shape == (2, model.embedding_dim)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(emb, axis=1)), 1.0, rtol=1e-5)

    # the GN coarsest level must propagate negatives (no ReLU): with
    # zero-mean GN output and identity scale this is guaranteed for any
    # non-constant input
    _, stages, _ = resnet_lib.apply_resnet(params, state, x,
                                           model.resnet_spec, train=False,
                                           return_stages=True)
    pyramid, _ = fpn_lib.apply_fpn(params, state, stages, model.fpn_spec,
                                   train=False)
    assert float(jnp.min(pyramid[0])) < 0.0


def test_fpn_coarsest_passthrough_when_dim_matches():
    """When the coarsest backbone dim already equals FPN.DIM the
    reference adds NO conv at all — res5 is passed straight through
    (FPN_reid.py:143-144)."""
    c = _fpn_cfg(fpn_num=2)
    c.FPN.DIM = 2048  # == res5 dim on ResNet-50
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    assert not any(k.startswith('fpn_inner_res5_2_sum')
                   and 'lateral' not in k for k in params)
    # the res4 lateral (1024 != 2048) still exists
    assert 'fpn_inner_res4_5_sum_lateral_w' in params

    from pps_tpu.models import resnet as resnet_lib
    x = jnp.asarray(np.random.RandomState(0).randn(2, 192, 64, 3),
                    jnp.float32)
    _, stages, _ = resnet_lib.apply_resnet(params, state, x,
                                           model.resnet_spec, train=False,
                                           return_stages=True)
    pyramid, _ = fpn_lib.apply_fpn(params, state, stages, model.fpn_spec,
                                   train=False)
    np.testing.assert_array_equal(np.asarray(pyramid[0]),
                                  np.asarray(stages['res5']))
