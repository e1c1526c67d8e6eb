"""Analytic forward-FLOP accounting for the re-ID models.

Counts conv/FC multiply-adds x2 (the standard convention) from the static
cfg-derived specs, so MFU numbers in BASELINE.md are reproducible.  BN,
pooling and elementwise work is excluded (it is not MXU work).
"""


def _conv_flops(h, w, kh, kw, c_in, c_out, stride=1, groups=1):
    ho, wo = -(-h // stride), -(-w // stride)
    return 2 * ho * wo * kh * kw * (c_in // groups) * c_out, ho, wo


def resnet_fwd_flops(spec, h, w):
    """Forward FLOPs/image of the conv body (pps_tpu/models/resnet.py)."""
    total, h, w = _conv_flops(h, w, 7, 7, 3, 64, stride=2)
    h, w = -(-h // 2), -(-w // 2)  # 3x3/2 max pool
    dim_in = 64
    groups = spec['num_groups']
    for (_stage, n_blocks, dim_out, dim_inner, stride, _dil) in spec['stages']:
        for i in range(n_blocks):
            s = stride if i == 0 else 1
            s1, s3 = (s, 1) if spec['stride_1x1'] else (1, s)
            if i == 0 and dim_in != dim_out:
                f, _, _ = _conv_flops(h, w, 1, 1, dim_in, dim_out, stride=s)
                total += f
            f, h1, w1 = _conv_flops(h, w, 1, 1, dim_in, dim_inner, stride=s1)
            total += f
            f, h1, w1 = _conv_flops(h1, w1, 3, 3, dim_inner, dim_inner,
                                    stride=s3, groups=groups)
            total += f
            f, _, _ = _conv_flops(h1, w1, 1, 1, dim_inner, dim_out)
            total += f
            h, w = h1, w1
            dim_in = dim_out
    return total, h, w


def model_fwd_flops(cfg):
    """Forward FLOPs/image of the full flagship-style model (body + stacked
    combo head + classifiers); FPN laterals included when FPN_ON."""
    from pps_tpu.models import model as model_lib
    m = model_lib.ReIDModel(cfg)
    w_in, h_in = cfg.REID.SCALE
    total, h, w = resnet_fwd_flops(m.resnet_spec, h_in, w_in)
    dim_in = m.resnet_spec['dim_out']
    if m.fpn_spec is not None:
        fd = m.fpn_spec['fpn_dim']
        # laterals (1x1) on res5..res{6-FPN_NUM} + 3x3 posthoc convs; count
        # the dominant coarsest-level terms only (the finer levels scale
        # the same way -- this is an accounting helper, not a simulator)
        total += 2 * h * w * dim_in * fd + 2 * h * w * 9 * fd * fd
        dim_in = fd
    # stacked combo head: per-combo FC dim_in->D, then D->K classifier
    r = m.num_combos
    d = m.head_spec['bpm_dim']
    total += 2 * r * (dim_in * d + d * cfg.MODEL.NUM_CLASSES)
    return total
