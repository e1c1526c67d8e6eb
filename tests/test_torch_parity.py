"""Independent cross-check: a torch (CPU) mirror of the reference operator
semantics, fed from a checkpoint written by our framework.

This is the parity harness the environment allows in place of running the
Caffe2 reference itself (no caffe2 runtime here): torch's conv/BN/pool
operators implement the same math as Caffe2's (OIHW conv with pad=k//2,
SpatialBN eps=1e-5, max-pool), and the mirror below is built from the
reference's graph structure (reference ResNet.py:246-343, bpm_heads.py:18-55,
pps_heads.py:38-76, reid_heads.py:34-127) — NOT from our jax code — so a
match validates both the model math and the checkpoint name/layout mapping.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.engine import checkpoint as ckpt_lib
from pps_tpu.models.model import build_model

torch.set_grad_enabled(False)


def _conv_bn(x, blobs, name, stride=1, dilation=1):
    w = torch.from_numpy(blobs[name + '_w'])
    k = w.shape[-1]
    pad = ((k - 1) * dilation) // 2
    x = F.conv2d(x, w, stride=stride, padding=pad, dilation=dilation)
    return _bn(x, blobs, name + '_bn')


def _bn(x, blobs, name):
    return F.batch_norm(
        x, torch.from_numpy(blobs[name + '_rm']),
        torch.from_numpy(blobs[name + '_riv']),
        torch.from_numpy(blobs[name + '_s']),
        torch.from_numpy(blobs[name + '_b']),
        training=False, eps=1e-5)


def _bottleneck(x, blobs, prefix, stride, dilation):
    # reference bottleneck_transformation (ResNet.py:276-343), stride on 1x1
    shortcut = x
    if prefix + '_branch1_w' in blobs:
        shortcut = _conv_bn(x, blobs, prefix + '_branch1', stride=stride)
    cur = F.relu(_conv_bn(x, blobs, prefix + '_branch2a', stride=stride))
    cur = F.relu(_conv_bn(cur, blobs, prefix + '_branch2b',
                          dilation=dilation))
    cur = _conv_bn(cur, blobs, prefix + '_branch2c')
    return F.relu(cur + shortcut)


def torch_reference_forward(blobs, images_nchw, strip_num, splits,
                            n_blocks=(3, 4, 6, 3), res5_stride=1):
    """The reference inference graph in torch ops."""
    x = torch.from_numpy(images_nchw)
    # stem: conv1/2 + bn + relu + maxpool 3x3/2 (basic_bn_stem)
    w = torch.from_numpy(blobs['conv1_w'])
    x = F.conv2d(x, w, stride=2, padding=3)
    x = F.relu(_bn(x, blobs, 'res_conv1_bn'))
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    strides = [1, 2, 2, res5_stride]
    for si, stage in enumerate(['res2', 'res3', 'res4', 'res5']):
        for b in range(n_blocks[si]):
            x = _bottleneck(x, blobs, '{}_{}'.format(stage, b),
                            stride=strides[si] if b == 0 else 1, dilation=1)

    # BPM uniform partition: per-strip global ave + max pool
    # (bpm_heads.py:44-55)
    aves, maxs = [], []
    start = 0
    for rows in splits:
        s = x[:, :, start:start + rows, :]
        aves.append(s.mean(dim=(2, 3)))
        maxs.append(s.amax(dim=(2, 3)))
        start += rows

    # PPS combos: Mean(member aves) + Max(member maxes) per bitmask
    # (pps_heads.py:47-68), then 1x1 conv + BN + ReLU + FC per combo
    # (reid_heads.py:42-90)
    feats, logits = [], []
    for i in range(1, 1 << strip_num):
        comb = [j for j in range(strip_num) if i & (1 << j)]
        prefix = 'pps' + ''.join(str(c) for c in comb)
        ave = torch.stack([aves[c] for c in comb]).mean(0)
        mx = torch.stack([maxs[c] for c in comb]).amax(0)
        cur = (ave + mx)[:, :, None, None]
        cur = F.conv2d(cur, torch.from_numpy(blobs[prefix + '_conv_w']),
                       torch.from_numpy(blobs[prefix + '_conv_b']))
        cur = F.relu(_bn(cur, blobs, prefix + '_bn'))[:, :, 0, 0]
        feats.append(cur)
        fc = cur @ torch.from_numpy(blobs[prefix + '_fc_w']).T \
            + torch.from_numpy(blobs[prefix + '_fc_b'])
        logits.append(fc)

    emb = torch.cat(feats, dim=1)
    emb = emb / emb.norm(dim=1, keepdim=True).clamp_min(1e-12)
    return emb.numpy(), torch.cat(logits, dim=1).numpy()


@pytest.fixture
def small_pps_cfg():
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '11',
        'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'TRAIN.FREEZE_AT', '0',
        'REID.SCALE', '(32, 96)',
        'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '16',
        'REID.NORMALIZE_FEATURE', 'True',
        'REID.MAX_AVE_FEATURE', 'True',
    ])
    assert_and_infer_cfg(make_immutable=False)
    return cfg


def test_embedding_matches_torch_reference(small_pps_cfg, tmp_path):
    c = small_pps_cfg
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(7))
    # randomize BN stats so eval-mode BN is non-trivial
    rng = np.random.RandomState(0)
    for k in list(state):
        if k.endswith('_rm'):
            state[k] = jax.numpy.asarray(
                rng.randn(*state[k].shape).astype(np.float32) * 0.1)
        if k.endswith('_riv'):
            state[k] = jax.numpy.asarray(
                rng.rand(*state[k].shape).astype(np.float32) + 0.5)

    path = str(tmp_path / 'parity.pkl')
    ckpt_lib.save_checkpoint(path, model, params, state, cfg=c)
    from pps_tpu.utils.io import load_object
    blobs = {k: np.asarray(v) for k, v in load_object(path)['blobs'].items()}

    images = rng.randn(3, 96, 32, 3).astype(np.float32) * 50.0

    ours = np.asarray(model.extract_features(
        params, state, jax.numpy.asarray(images)))
    theirs, _ = torch_reference_forward(
        blobs, np.transpose(images, (0, 3, 1, 2)).copy(),
        strip_num=3, splits=model.head_spec['splits'])

    assert ours.shape == theirs.shape == (3, model.embedding_dim)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)
