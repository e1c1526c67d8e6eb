"""BN-folding parity: folded params produce identical embeddings."""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.models.folding import fold_conv_bn
from pps_tpu.models.model import build_model


def test_fold_conv_bn_parity():
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'REID.NORMALIZE_FEATURE', 'True'])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for k in list(state):
        if k.endswith('_rm'):
            state[k] = jnp.asarray(
                rng.randn(*state[k].shape).astype('f4') * 0.1)
        if k.endswith('_riv'):
            state[k] = jnp.asarray(
                rng.rand(*state[k].shape).astype('f4') + 0.5)
    x = jnp.asarray(rng.randn(2, 96, 32, 3).astype('f4') * 50)
    base = np.asarray(model.extract_features(params, state, x))
    folded = fold_conv_bn(params, state)
    assert 'conv1_fb' in folded and 'res2_0_branch2a_fb' in folded
    out = np.asarray(model.extract_features(folded, state, x))
    np.testing.assert_allclose(base, out, rtol=1e-3, atol=1e-4)


def test_fold_conv_bn_fpn_parity():
    """FPN lateral 1x1 convs ([C_in, C_out] einsum weights + conv bias)
    fold too: folded params produce the same embeddings."""
    from pps_tpu.config import reset_cfg
    reset_cfg()
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'FPN_reid.add_fpn_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FPN.FPN_ON', 'True', 'FPN.DIM', '16',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'REID.NORMALIZE_FEATURE', 'True',
        'REID.FPN_NUM', '2', 'REID.FPN_SHARED', 'True'])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    for k in list(state):
        if k.endswith('_rm'):
            state[k] = jnp.asarray(
                rng.randn(*state[k].shape).astype('f4') * 0.1)
        if k.endswith('_riv'):
            state[k] = jnp.asarray(
                rng.rand(*state[k].shape).astype('f4') + 0.5)
    # nonzero FPN conv biases so the bias-folding term is exercised
    for k in list(params):
        if k.startswith('fpn_') and k.endswith('_b'):
            params[k] = jnp.asarray(
                rng.randn(*params[k].shape).astype('f4') * 0.1)
    x = jnp.asarray(rng.randn(2, 96, 32, 3).astype('f4') * 50)
    base = np.asarray(model.extract_features(params, state, x))
    folded = fold_conv_bn(params, state)
    fpn_fb = [k for k in folded if k.startswith('fpn_')
              and k.endswith('_fb')]
    assert fpn_fb, 'no FPN convs were folded'
    out = np.asarray(model.extract_features(folded, state, x))
    np.testing.assert_allclose(base, out, rtol=1e-3, atol=1e-4)


def test_fpn_checkpoint_pkl_roundtrip(tmp_path):
    """FPN 1x1 weights must live in the pkl as [C_out, C_in, 1, 1] conv
    blobs (the reference layout) and round-trip back to the 2-D einsum
    params (CLAUDE.md invariant: pkl-compatible both directions)."""
    from pps_tpu.config import reset_cfg
    from pps_tpu.engine.checkpoint import save_checkpoint, load_checkpoint
    from pps_tpu.utils.io import load_object
    reset_cfg()
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'FPN_reid.add_fpn_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FPN.FPN_ON', 'True', 'FPN.DIM', '16',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'REID.NORMALIZE_FEATURE', 'True',
        'REID.FPN_NUM', '2', 'REID.FPN_SHARED', 'True'])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(2))
    path = str(tmp_path / 'fpn_ckpt.pkl')
    save_checkpoint(path, model, params, state)

    blobs = load_object(path)['blobs']
    fpn_w = [k for k in blobs if k.startswith('fpn_') and k.endswith('_w')]
    assert fpn_w, 'no FPN weights in checkpoint'
    for k in fpn_w:
        assert blobs[k].ndim == 4 and blobs[k].shape[2:] == (1, 1), \
            (k, blobs[k].shape)
        cin, cout = np.asarray(params[k]).shape
        assert blobs[k].shape[:2] == (cout, cin)

    p2, s2 = model.init(jax.random.PRNGKey(99))
    p2, s2, _ = load_checkpoint(path, model, p2, s2)
    for k in fpn_w:
        np.testing.assert_array_equal(np.asarray(p2[k]),
                                      np.asarray(params[k]), err_msg=k)
