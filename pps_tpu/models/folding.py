"""Inference-time BatchNorm folding.

At eval, SpatialBN is an affine transform with frozen statistics, so it
folds into the preceding conv:  w' = w * s/sqrt(riv+eps),
b' = bn_b - rm * s/sqrt(riv+eps).  This removes every backbone/FPN BN op
(and its f32<->bf16 casts around the bf16 convs) from the extraction
graph — the TPU-deploy analog of the reference's train->predict_net
conversion (reference tools/convert_pkl_to_pb.py fuses AffineChannel the
same way).

The folded dict adds a '{conv}_fb' bias per folded conv; `_conv_bn` in
models/resnet.py detects it at eval time and skips the BN, so folded
params run through the unmodified apply functions.
"""

import jax.numpy as jnp

from pps_tpu.models.resnet import BN_EPSILON


def fold_conv_bn(params, state):
    """Returns a new params dict with backbone/FPN conv+BN pairs folded."""
    folded = dict(params)
    for name in list(params):
        if not name.endswith('_w'):
            continue
        base = name[:-2]
        # stem quirk: conv1_w pairs with res_conv1_bn (reference
        # ResNet.py:246-251 naming)
        bn = 'res_conv1_bn' if base == 'conv1' else base + '_bn'
        if bn + '_s' not in params:
            continue
        w = params[name]
        if w.ndim not in (2, 4):
            continue  # stacked head convs pair with differently-named BN
        if bn + '_rm' in state:
            inv = params[bn + '_s'] / jnp.sqrt(state[bn + '_riv'] +
                                               BN_EPSILON)
        else:
            # AffineChannel (MODEL.USE_BN=False): y = x*s + b folds as
            # w' = w*s, fb = b — no statistics to absorb
            inv = params[bn + '_s']
        # broadcasts over the out dim: HWIO 4-D convs and [C_in, C_out]
        # 2-D FPN einsum weights both keep C_out last
        folded[name] = w * inv
        fb = params[bn + '_b'] - (
            state[bn + '_rm'] * inv if bn + '_rm' in state else 0.0)
        if base + '_b' in params:  # FPN convs carry a conv bias too
            fb = fb + params[base + '_b'] * inv
        folded[base + '_fb'] = fb
    return folded
