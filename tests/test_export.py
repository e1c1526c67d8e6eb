"""StableHLO export round-trip (tools/export_model.py path)."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.models.folding import fold_conv_bn
from pps_tpu.models.model import build_model


def test_export_roundtrip(tmp_path):
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
    params = fold_conv_bn(params, state)

    def serve(images):
        return model.extract_features(params, state, images)

    spec = jax.ShapeDtypeStruct((2, 96, 32, 3), jnp.float32)
    blob = jax_export.export(jax.jit(serve))(spec).serialize()
    path = tmp_path / 'model.shlo'
    path.write_bytes(blob)

    reloaded = jax_export.deserialize(path.read_bytes())
    x = np.random.RandomState(0).randn(2, 96, 32, 3).astype(np.float32)
    got = np.asarray(reloaded.call(x))
    want = np.asarray(serve(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_int8_roundtrip(tmp_path):
    """The int8 PTQ serving graph (tools/export_model.py --int8)
    serializes to StableHLO and reloads bit-identically."""
    from pps_tpu.config import reset_cfg
    from pps_tpu.models.quantize import quantize_for_eval
    reset_cfg()
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
    calib = rng.randn(4, 96, 32, 3).astype(np.float32) * 50
    qparams = quantize_for_eval(model, params, state, calib, batch_size=4)

    def serve(images):
        return model.extract_features(qparams, state, images)

    spec = jax.ShapeDtypeStruct((2, 96, 32, 3), jnp.float32)
    blob = jax_export.export(jax.jit(serve))(spec).serialize()
    reloaded = jax_export.deserialize(blob)
    x = rng.randn(2, 96, 32, 3).astype(np.float32) * 50
    got = np.asarray(reloaded.call(x))
    want = np.asarray(serve(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
