"""Torch (CPU) mirror of the reference operator semantics.

The parity harness the environment allows in place of running the Caffe2
reference itself (no caffe2 runtime here): torch's conv/BN/pool operators
implement the same math as Caffe2's (OIHW conv with pad=k//2, SpatialBN
eps=1e-5, max-pool), and the mirror below is built from the reference's
graph structure (reference ResNet.py:246-343, bpm_heads.py:18-55,
pps_heads.py:38-76, reid_heads.py:34-127) — NOT from our jax code — so a
match validates both the model math and the checkpoint name/layout
mapping.  It consumes a reference-format checkpoint blob dict (the pkl
our engine/checkpoint.py writes, which IS the reference's on-disk
contract) and, via :func:`torch_extract_features`, replays the
reference's whole test-time extraction over a roidb: decode -> float32
-mean -> bicubic resize (reference blob.py:97-117) -> NCHW -> network ->
concat + L2 normalize (reference reid_heads.py:95-127).

Used by tests/test_torch_parity.py (single-batch operator parity) and
tools/e2e_parity.py + tests/test_e2e_accuracy_parity.py (the full
train -> extract -> evaluate chain against the reference-oracle scorer).
"""

import numpy as np

_N_BLOCKS = {
    'ResNet.add_ResNet50_conv5_body': (3, 4, 6, 3),
    'ResNet.add_ResNet101_conv5_body': (3, 4, 23, 3),
    'ResNet.add_ResNet152_conv5_body': (3, 8, 36, 3),
}


def _torch():
    import torch
    torch.set_grad_enabled(False)
    return torch


def _bn(F, torch, x, blobs, name):
    return F.batch_norm(
        x, torch.from_numpy(np.asarray(blobs[name + '_rm'])),
        torch.from_numpy(np.asarray(blobs[name + '_riv'])),
        torch.from_numpy(np.asarray(blobs[name + '_s'])),
        torch.from_numpy(np.asarray(blobs[name + '_b'])),
        training=False, eps=1e-5)


def _conv_bn(F, torch, x, blobs, name, stride=1, dilation=1):
    w = torch.from_numpy(np.asarray(blobs[name + '_w']))
    k = w.shape[-1]
    pad = ((k - 1) * dilation) // 2
    x = F.conv2d(x, w, stride=stride, padding=pad, dilation=dilation)
    return _bn(F, torch, x, blobs, name + '_bn')


def _bottleneck(F, torch, x, blobs, prefix, stride, dilation):
    # reference bottleneck_transformation (ResNet.py:276-343), stride on 1x1
    shortcut = x
    if prefix + '_branch1_w' in blobs:
        shortcut = _conv_bn(F, torch, x, blobs, prefix + '_branch1',
                            stride=stride)
    cur = F.relu(_conv_bn(F, torch, x, blobs, prefix + '_branch2a',
                          stride=stride))
    cur = F.relu(_conv_bn(F, torch, cur, blobs, prefix + '_branch2b',
                          dilation=dilation))
    cur = _conv_bn(F, torch, cur, blobs, prefix + '_branch2c')
    return F.relu(cur + shortcut)


def torch_reference_forward(blobs, images_nchw, strip_num, splits,
                            n_blocks=(3, 4, 6, 3), res5_stride=1,
                            mode='mean_max'):
    """The reference inference graph in torch ops.

    Returns (embeddings [B, R*D] L2-normalized, logits [B, R*K]).
    ``mode``: 'mean_max' = Mean(member aves) + Max(member maxes)
    (pps_heads.py:58-68 with REID.MAX_AVE_FEATURE); 'ave' = mean of
    member ave-pools only.
    """
    torch = _torch()
    import torch.nn.functional as F

    x = torch.from_numpy(images_nchw)
    # stem: conv1 + bn + relu + maxpool 3x3/2 (basic_bn_stem)
    w = torch.from_numpy(np.asarray(blobs['conv1_w']))
    x = F.conv2d(x, w, stride=2, padding=3)
    x = F.relu(_bn(F, torch, x, blobs, 'res_conv1_bn'))
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    strides = [1, 2, 2, res5_stride]
    for si, stage in enumerate(['res2', 'res3', 'res4', 'res5']):
        for b in range(n_blocks[si]):
            x = _bottleneck(F, torch, x, blobs, '{}_{}'.format(stage, b),
                            stride=strides[si] if b == 0 else 1, dilation=1)

    # BPM partition: per-strip global ave + max pool (bpm_heads.py:44-55)
    aves, maxs = [], []
    start = 0
    for rows in splits:
        s = x[:, :, start:start + rows, :]
        aves.append(s.mean(dim=(2, 3)))
        maxs.append(s.amax(dim=(2, 3)))
        start += rows

    # PPS combos: bitmask power-set order (pps_heads.py:47-68), then
    # 1x1 conv + BN + ReLU + FC per combo (reid_heads.py:42-90)
    feats, logits = [], []
    for i in range(1, 1 << strip_num):
        comb = [j for j in range(strip_num) if i & (1 << j)]
        prefix = 'pps' + ''.join(str(c) for c in comb)
        ave = torch.stack([aves[c] for c in comb]).mean(0)
        if mode == 'mean_max':
            mx = torch.stack([maxs[c] for c in comb]).amax(0)
            cur = (ave + mx)[:, :, None, None]
        else:
            cur = ave[:, :, None, None]
        cur = F.conv2d(cur,
                       torch.from_numpy(np.asarray(blobs[prefix + '_conv_w'])),
                       torch.from_numpy(np.asarray(blobs[prefix + '_conv_b'])))
        cur = F.relu(_bn(F, torch, cur, blobs, prefix + '_bn'))[:, :, 0, 0]
        feats.append(cur)
        fc = cur @ torch.from_numpy(np.asarray(blobs[prefix + '_fc_w'])).T \
            + torch.from_numpy(np.asarray(blobs[prefix + '_fc_b']))
        logits.append(fc)

    emb = torch.cat(feats, dim=1)
    emb = emb / emb.norm(dim=1, keepdim=True).clamp_min(1e-12)
    return emb.numpy(), torch.cat(logits, dim=1).numpy()


def mirror_spec_from_cfg(cfg):
    """Mirror hyper-geometry from a merged config.

    The mirror covers the reference's flagship inference family:
    BN ResNet body + PPS power-set head (pps_heads.add_pps_part_head).
    """
    assert cfg.MODEL.USE_BN, 'torch mirror covers the BN body only'
    assert 'pps_heads' in cfg.FAST_RCNN.ROI_BOX_HEAD, \
        'torch mirror covers the PPS power-set head only'
    assert not cfg.FPN.FPN_ON, 'torch mirror covers the single-scale body'
    from pps_tpu.models.heads import strip_splits
    n_blocks = _N_BLOCKS[cfg.MODEL.CONV_BODY]
    strip_num = cfg.REID.BPM_STRIP_NUM
    # body output stride is 16 with RES5_STRIDE 1 (the re-ID setting),
    # 32 with the classification-stride res5
    spatial_scale = 1.0 / (16 * cfg.RESNETS.RES5_STRIDE)
    splits = strip_splits(strip_num, cfg.REID.SCALE[1], spatial_scale)
    mode = 'mean_max' if cfg.REID.MAX_AVE_FEATURE else 'ave'
    return dict(strip_num=strip_num, splits=splits, n_blocks=n_blocks,
                res5_stride=cfg.RESNETS.RES5_STRIDE, mode=mode)


def torch_extract_features(cfg, blobs, roidb, decode_fn=None, batch_size=8):
    """Reference-style test-set extraction, end to end in torch/numpy.

    Per image: decode (BGR uint8) -> float32 -> subtract PIXEL_MEANS ->
    bicubic resize to REID.SCALE (reference blob.py:97-117; the re-ID
    test path pins the resize, core/test.py:970-979) -> NCHW -> network.
    Deliberately does NOT call our data/transforms code: the prep here is
    an independent expression of the reference's blob semantics so the
    comparison chain stays two-sided.
    """
    import cv2
    spec = mirror_spec_from_cfg(cfg)
    if decode_fn is None:
        def decode_fn(path):
            im = cv2.imread(path)
            assert im is not None, path
            return im
    w, h = cfg.REID.SCALE
    means = np.asarray(cfg.PIXEL_MEANS, np.float32)
    out = []
    for start in range(0, len(roidb), batch_size):
        chunk = roidb[start:start + batch_size]
        ims = []
        for entry in chunk:
            im = decode_fn(entry['image']).astype(np.float32) - means
            ims.append(cv2.resize(im, (w, h),
                                  interpolation=cv2.INTER_CUBIC))
        nchw = np.transpose(np.stack(ims), (0, 3, 1, 2)).copy()
        emb, _ = torch_reference_forward(blobs, nchw, **spec)
        out.append(emb)
    return (np.concatenate(out, axis=0) if out
            else np.zeros((0, 0), np.float32))
