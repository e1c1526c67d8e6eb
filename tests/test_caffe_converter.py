"""Caffe-1 caffemodel converter test: encode a synthetic NetParameter in
raw protobuf wire format, convert, and load into the model."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import convert_caffe_model as ccm


# -- tiny protobuf writer ----------------------------------------------------

def _varint(v):
    out = b''
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(field, wt):
    return _varint((field << 3) | wt)


def _len_field(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _blob(data, shape):
    shape_payload = b''
    for d in shape:
        shape_payload += _tag(1, 0) + _varint(d)
    payload = _len_field(7, shape_payload)
    payload += _len_field(5, np.asarray(data, '<f4').tobytes())
    return payload


def _layer(name, ltype, blobs):
    payload = _len_field(1, name.encode())
    payload += _len_field(2, ltype.encode())
    for b in blobs:
        payload += _len_field(7, b)
    return _len_field(100, payload)  # NetParameter.layer


def _make_caffemodel(path):
    rng = np.random.RandomState(0)
    conv_w = rng.randn(8, 3, 7, 7).astype(np.float32)
    res_w = rng.randn(4, 8, 1, 1).astype(np.float32)
    bn_mean = rng.randn(8).astype(np.float32)
    bn_var = rng.rand(8).astype(np.float32) + 0.5
    factor = np.array([2.0], np.float32)  # moving-average scale factor
    gamma = rng.randn(8).astype(np.float32)
    beta = rng.randn(8).astype(np.float32)
    fc_w = rng.randn(5, 4).astype(np.float32)
    fc_b = rng.randn(5).astype(np.float32)

    net = b''
    net += _layer('conv1', 'Convolution', [_blob(conv_w, conv_w.shape)])
    net += _layer('bn_conv1', 'BatchNorm',
                  [_blob(bn_mean, (8,)), _blob(bn_var, (8,)),
                   _blob(factor, (1,))])
    net += _layer('scale_conv1', 'Scale',
                  [_blob(gamma, (8,)), _blob(beta, (8,))])
    net += _layer('res2a_branch2a', 'Convolution',
                  [_blob(res_w, res_w.shape)])
    net += _layer('bn2a_branch2a', 'BatchNorm',
                  [_blob(bn_mean / 2, (8,)), _blob(bn_var / 2, (8,)),
                   _blob(np.array([1.0], np.float32), (1,))])
    net += _layer('scale2a_branch2a', 'Scale',
                  [_blob(gamma, (8,)), _blob(beta, (8,))])
    net += _layer('fc1000', 'InnerProduct',
                  [_blob(fc_w, fc_w.shape), _blob(fc_b, (5,))])
    with open(path, 'wb') as f:
        f.write(net)
    return dict(conv_w=conv_w, res_w=res_w, bn_mean=bn_mean, bn_var=bn_var,
                gamma=gamma, beta=beta, fc_w=fc_w, fc_b=fc_b)


def test_convert_caffemodel(tmp_path):
    path = str(tmp_path / 'net.caffemodel')
    ref = _make_caffemodel(path)
    blobs = ccm.convert(path)

    # conv weights in OIHW with normalized names
    np.testing.assert_array_equal(blobs['conv1_w'], ref['conv_w'])
    np.testing.assert_array_equal(blobs['res2_0_branch2a_w'], ref['res_w'])
    # stem BN: bn_conv1 -> res_conv1_bn, moving averages / factor(=2)
    np.testing.assert_allclose(blobs['res_conv1_bn_rm'],
                               ref['bn_mean'] / 2.0, rtol=1e-6)
    np.testing.assert_allclose(blobs['res_conv1_bn_riv'],
                               ref['bn_var'] / 2.0, rtol=1e-6)
    np.testing.assert_array_equal(blobs['res_conv1_bn_s'], ref['gamma'])
    np.testing.assert_array_equal(blobs['res_conv1_bn_b'], ref['beta'])
    # block BN with factor 1
    np.testing.assert_allclose(blobs['res2_0_branch2a_bn_rm'],
                               ref['bn_mean'] / 2.0, rtol=1e-6)
    # FC layer kept under its own name
    np.testing.assert_array_equal(blobs['fc1000_w'], ref['fc_w'])


def test_converted_pkl_loads_into_model(tmp_path):
    """A (partial) converted pkl loads into our params via the standard
    name-matched loader, like the reference's R-50_BN.pkl bootstrap."""
    import jax
    from pps_tpu.config import cfg, merge_cfg_from_list
    from pps_tpu.engine import checkpoint as ckpt_lib
    from pps_tpu.models.model import build_model
    from pps_tpu.utils.io import save_object

    path = str(tmp_path / 'net.caffemodel')
    _make_caffemodel(path)
    blobs = ccm.convert(path)
    # keep only stem blobs, shaped like R-50 (64 filters); matched names
    # with wrong shapes raise, like the reference loader (utils/net.py:53)
    rng = np.random.RandomState(1)
    blobs = {k: v for k, v in blobs.items()
             if k.startswith(('conv1', 'res_conv1', 'fc1000'))}
    blobs['conv1_w'] = rng.randn(64, 3, 7, 7).astype(np.float32)
    for sfx in ('_rm', '_riv', '_s', '_b'):
        blobs['res_conv1_bn' + sfx] = rng.randn(64).astype(np.float32)
    pkl = str(tmp_path / 'R-50_BN.pkl')
    save_object(blobs, pkl)

    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8'])
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, _ = ckpt_lib.load_checkpoint(pkl, model, params, state)
    # conv1 is HWIO internally; compare against the OIHW source
    np.testing.assert_allclose(
        np.asarray(params['conv1_w']),
        np.transpose(blobs['conv1_w'], (2, 3, 1, 0)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state['res_conv1_bn_rm']),
                               blobs['res_conv1_bn_rm'], rtol=1e-6)
