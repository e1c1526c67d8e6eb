"""int8 PTQ serving path (models/quantize.py + resnet.conv2d_int8).

Beyond-reference capability (the reference serves f32 Caffe2 only);
correctness is held by a hand-computed quantized-conv golden plus
embedding-fidelity bounds against the f32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pps_tpu.config import cfg, merge_cfg_from_list, \
    assert_and_infer_cfg, reset_cfg
from pps_tpu.models.folding import fold_conv_bn
from pps_tpu.models.model import build_model
from pps_tpu.models.quantize import (
    calibrate_amax, quantize_body, quantize_for_eval)
from pps_tpu.models.resnet import conv2d_int8


def test_conv2d_int8_golden():
    """conv2d_int8 == hand-quantized numpy int8 conv + dequant."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 5, 8).astype(np.float32)
    w = rng.randn(3, 3, 8, 4).astype(np.float32)
    fb = rng.randn(4).astype(np.float32)
    s_x = np.abs(x).max() / 127.0
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-12)
    wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)

    out = np.asarray(conv2d_int8(
        jnp.asarray(x), jnp.asarray(wq), jnp.float32(1.0 / s_x),
        jnp.asarray((s_w * s_x).astype(np.float32)), jnp.asarray(fb)))

    xq = np.clip(np.round(x / s_x), -127, 127).astype(np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 6, 5, 4), np.int64)
    for i in range(6):
        for j in range(5):
            patch = xp[:, i:i + 3, j:j + 3, :]
            ref[:, i, j, :] = np.einsum(
                'bhwc,hwco->bo', patch, wq.astype(np.int64))
    ref_f = ref.astype(np.float32) * (s_w * s_x) + fb
    np.testing.assert_allclose(out, ref_f, rtol=1e-5, atol=1e-4)


def _tiny_model(extra=()):
    reset_cfg()
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'REID.NORMALIZE_FEATURE', 'True',
    ] + list(extra))
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
    images = rng.randn(4, 96, 32, 3).astype('f4') * 50
    return model, params, state, images


def test_quantize_embedding_fidelity():
    model, params, state, images = _tiny_model()
    base = np.asarray(model.extract_features(params, state,
                                             jnp.asarray(images)))
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    # body convs replaced by int8 weights; f32 kernels gone
    assert 'conv1_wq' in qparams and 'conv1_w' not in qparams
    assert 'res5_2_branch2c_wq' in qparams
    assert qparams['res2_0_branch2a_wq'].dtype == jnp.int8
    # head params untouched
    assert any(k.startswith(model.head_param_prefix) for k in qparams)

    out = np.asarray(model.extract_features(qparams, state,
                                            jnp.asarray(images)))
    assert out.shape == base.shape
    cos = np.sum(out * base, axis=1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(base, axis=1))
    # random-init net, 17 quantized convs deep: int8 PTQ with per-channel
    # weight scales holds embeddings to ~1e-3 cosine error
    assert cos.min() > 0.995, cos
    # and the quantized path must actually differ (it really ran int8)
    assert np.abs(out - base).max() > 0


def test_quantize_missing_calibration_raises():
    model, params, state, images = _tiny_model()
    folded = fold_conv_bn(params, state)
    amax = calibrate_amax(folded, state, model.resnet_spec, [images])
    assert 'conv1' in amax and 'res3_1_branch2b' in amax
    amax_bad = dict(amax)
    del amax_bad['res4_0_branch1']
    with pytest.raises(KeyError):
        quantize_body(folded, amax_bad)


def test_quantize_fpn_body_only():
    """FPN variant: body convs quantize, FPN laterals stay float."""
    model, params, state, images = _tiny_model(extra=[
        'MODEL.CONV_BODY', 'FPN_reid.add_fpn_ResNet50_conv5_body',
        'FPN.FPN_ON', 'True', 'FPN.DIM', '16',
        'REID.FPN_NUM', '2', 'REID.FPN_SHARED', 'True'])
    base = np.asarray(model.extract_features(params, state,
                                             jnp.asarray(images)))
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    assert 'res2_0_branch2a_wq' in qparams
    fpn_q = [k for k in qparams if k.startswith('fpn') and
             k.endswith('_wq')]
    assert not fpn_q, fpn_q
    out = np.asarray(model.extract_features(qparams, state,
                                            jnp.asarray(images)))
    cos = np.sum(out * base, axis=1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(base, axis=1))
    assert cos.min() > 0.995, cos


def test_quantize_gn_body():
    """GroupNorm body (MODEL.USE_GN): convs quantize with fb=0 and GN
    runs on the dequantized output (GN stats are input-dependent, so
    there is nothing to fold)."""
    model, params, state, images = _tiny_model(extra=[
        'MODEL.USE_GN', 'True', 'MODEL.USE_BN', 'False',
        'GROUP_NORM.NUM_GROUPS', '4'])
    base = np.asarray(model.extract_features(params, state,
                                             jnp.asarray(images)))
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    assert 'conv1_wq' in qparams and 'res5_2_branch2c_wq' in qparams
    assert float(jnp.max(jnp.abs(qparams['res2_0_branch2a_fb']))) == 0.0
    out = np.asarray(model.extract_features(qparams, state,
                                            jnp.asarray(images)))
    cos = np.sum(out * base, axis=1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(base, axis=1))
    # GN bodies quantize with PER-INPUT-CHANNEL activation scales
    # folded into the weights (the cross-channel gamma spread is what
    # made one per-tensor scale lose ~3%/layer; measured here:
    # per-tensor min cosine 0.929 -> per-channel 1.00000)
    assert cos.min() > 0.999, cos


def test_quantize_affine_channel_body():
    """AffineChannel body (MODEL.USE_BN=False): the affine folds into the
    conv exactly like BN, so the quantized path covers it unchanged."""
    model, params, state, images = _tiny_model(extra=[
        'MODEL.USE_BN', 'False'])
    rng = np.random.RandomState(5)
    for k in list(params):  # nontrivial affine scales/biases
        if k.endswith('_bn_s'):
            params[k] = jnp.asarray(
                rng.rand(*params[k].shape).astype('f4') + 0.5)
        if k.endswith('_bn_b'):
            params[k] = jnp.asarray(
                rng.randn(*params[k].shape).astype('f4') * 0.1)
    base = np.asarray(model.extract_features(params, state,
                                             jnp.asarray(images)))
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    assert 'conv1_wq' in qparams
    out = np.asarray(model.extract_features(qparams, state,
                                            jnp.asarray(images)))
    cos = np.sum(out * base, axis=1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(base, axis=1))
    assert cos.min() > 0.995, cos


def test_int8_with_flip_tta():
    """flip-TTA (TEST.BBOX_AUG.H_FLIP) composes with quantized params:
    the jitted TTA extraction runs the int8 graph twice and averages."""
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel.eval_step import make_extract_fn
    model, params, state, images = _tiny_model()
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    mesh = mesh_lib.build_mesh(cfg)
    with mesh:
        fn = make_extract_fn(model, mesh, flip_tta=True)
        x = jnp.asarray(np.tile(images, (2, 1, 1, 1)))
        out = np.asarray(fn(qparams, state, x))
    assert out.shape == (8, model.embedding_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                               rtol=1e-4)


def test_engine_wiring_quantizes_from_roidb():
    """TPU.INT8_EVAL engine hook: calibrates off roidb images through
    the host preprocessing path and returns body-quantized params."""
    from pps_tpu.engine.test import quantize_params_for_dataset
    model, params, state, _ = _tiny_model()
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_CALIB_IMAGES = 4
    rng = np.random.RandomState(3)
    ims = [(rng.rand(96, 32, 3) * 255).astype('u1') for _ in range(6)]
    roidb = [dict(image='mem://%d' % i, height=96, width=32)
             for i in range(6)]
    qp = quantize_params_for_dataset(
        cfg, model, params, state, roidb,
        decode_fn=lambda p: ims[int(p.split('//')[1])])
    assert 'conv1_wq' in qp and 'conv1_w' not in qp
    x = jnp.asarray(rng.randn(2, 96, 32, 3).astype('f4') * 50)
    out = np.asarray(model.extract_features(qp, state, x))
    assert np.all(np.isfinite(out))


def test_int8_extract_through_mesh():
    """The jitted sharded extraction path (make_extract_fn) runs the
    auto-detected int8 graph over the 8-device CPU mesh."""
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel.eval_step import make_extract_fn
    model, params, state, images = _tiny_model()
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    mesh = mesh_lib.build_mesh(cfg)
    with mesh:
        fn = make_extract_fn(model, mesh)
        x = jnp.asarray(np.tile(images, (2, 1, 1, 1)))
        out = np.asarray(fn(qparams, state, x))
    ref = np.asarray(model.extract_features(qparams, state,
                                            jnp.asarray(images)))
    np.testing.assert_allclose(out[:4], ref, rtol=2e-3, atol=2e-3)


def test_quantize_gn_resnext_grouped_absorb():
    """ResNeXt + GN: per-input-channel activation scales absorb into
    GROUPED conv weights block-diagonally (w[..., i, o] sees input
    channel (o // out_per_group) * i_w + i) — the fidelity bound proves
    the factor indexing is right."""
    model, params, state, images = _tiny_model(extra=[
        'MODEL.USE_GN', 'True', 'MODEL.USE_BN', 'False',
        'GROUP_NORM.NUM_GROUPS', '4',
        'RESNETS.NUM_GROUPS', '4', 'RESNETS.WIDTH_PER_GROUP', '4'])
    base = np.asarray(model.extract_features(params, state,
                                             jnp.asarray(images)))
    qparams = quantize_for_eval(model, params, state, images,
                                batch_size=4)
    # a grouped 3x3: input-channel axis is C_in / groups wide, while
    # xinv carries the full C_in scales
    w3 = qparams['res3_0_branch2b_wq']
    xinv3 = qparams['res3_0_branch2b_xinv']
    assert w3.shape[2] * 4 == int(np.asarray(xinv3).size)
    out = np.asarray(model.extract_features(qparams, state,
                                            jnp.asarray(images)))
    cos = np.sum(out * base, axis=1) / (
        np.linalg.norm(out, axis=1) * np.linalg.norm(base, axis=1))
    assert cos.min() > 0.999, cos
