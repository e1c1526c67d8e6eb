"""Streaming test-set extraction: O(batch) host memory, same features.

VERDICT round-1 weak #6: the resident path decodes the whole test set into
one stack (~11.6 GB f32 at Market scale).  stream_extract pipelines
decode -> preprocess -> H2D -> extract per batch; these tests pin that the
streamed features bit-match the resident path on homogeneous sets and stay
correct on mixed-size sets (where per-batch host preprocessing kicks in).
"""

import jax
import numpy as np
import pytest

from pps_tpu.config import (cfg, merge_cfg_from_list, assert_and_infer_cfg)
from pps_tpu.engine import test as test_lib
from pps_tpu.models.model import build_model


def _setup(n=21):
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(16, 48)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'REID.NORMALIZE_FEATURE', 'True',
        'TEST.IMS_PER_BATCH', '1',
    ])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    roidb = [{'image': 'mem://%d' % i,
              'im_name': '%08d_%04d_%08d.jpg' % (i % 4 + 1, i % 2 + 1, i),
              'gt_class': i % 4 + 1, 'mark': 0 if i % 5 == 0 else 1,
              'flipped': False} for i in range(n)]
    return model, params, state, roidb


def _decode_same(path):
    i = int(path.split('//')[1])
    return (np.random.RandomState(i).rand(64, 24, 3) * 255).astype(np.uint8)


def _decode_mixed(path):
    i = int(path.split('//')[1])
    rng = np.random.RandomState(i)
    hw = [(64, 24), (50, 20), (72, 30)][i % 3]
    return (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)


def test_streaming_matches_resident_same_size():
    model, params, state, roidb = _setup()
    resident = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_same,
        streaming=False)
    streamed = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_same,
        streaming=True)
    assert streamed.shape == resident.shape == (len(roidb),
                                                model.embedding_dim)
    np.testing.assert_allclose(streamed, resident, atol=1e-6)


def test_streaming_mixed_sizes():
    """Mixed raw sizes: resident path falls back to a host-preprocessed
    stack; streaming must produce the same embeddings batch by batch."""
    model, params, state, roidb = _setup()
    resident = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_mixed,
        streaming=False)
    streamed = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_mixed,
        streaming=True)
    np.testing.assert_allclose(streamed, resident, atol=1e-5)


def test_streaming_tail_batch_and_tiny_set():
    model, params, state, roidb = _setup(n=3)  # smaller than one batch
    streamed = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_same,
        streaming=True)
    resident = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_same,
        streaming=False)
    np.testing.assert_allclose(streamed, resident, atol=1e-6)


def test_streaming_padded_wire_mixed_sizes():
    """Mixed raw sizes WITH roidb height/width metadata: streaming rides
    the padded device-preproc wire (one bucket shape + valid_hw, one
    compile) and matches the host-preprocessed resident path."""
    model, params, state, roidb = _setup()
    for e in roidb:
        i = int(e['image'].split('//')[1])
        h, w = [(64, 24), (50, 20), (72, 30)][i % 3]
        e['height'], e['width'] = h, w
    resident = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_mixed,
        streaming=False)
    streamed = test_lib.extract_dataset_features(
        cfg, model, params, state, roidb, decode_fn=_decode_mixed,
        streaming=True)
    # device bicubic is cv2-exact to float rounding; embeddings are
    # L2-normalized, so agreement is tight but not bitwise
    np.testing.assert_allclose(streamed, resident, atol=5e-4)
