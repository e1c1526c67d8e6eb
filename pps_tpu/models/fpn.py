"""FPN for the "scale-free" multi-scale re-ID variant.

Rebuild of /root/reference/detectron/modeling/FPN_reid.py:46-345 (the re-ID
fork of FPN, not the detection one):

* coarsest level: 1x1 conv (Xavier) + SpatialBN + ReLU on res5
  (FPN_reid.py:161-174); under FPN.USE_GN the reference uses ConvGN
  instead — bias-free conv + GroupNorm with NO ReLU (FPN_reid.py:145-159;
  the Relu at :173 belongs to the BN else-branch only)
* top-down/lateral: lateral 1x1+BN+ReLU only when the backbone dim differs
  from FPN.DIM (res2 at 256 passes through); laterals ALWAYS use
  SpatialBN+ReLU — add_topdown_lateral_module has no GN branch
  (FPN_reid.py:340-347; the USE_GN post-hoc 3x3 ConvGN is dead code behind
  the `continue` at :199-203); the top-down branch is always the previous
  output (dim already FPN.DIM); nearest 2x upsample is SKIPPED between
  res5 and res4 when RES5_STRIDE=1 — both are 1/16 (FPN_reid.py:300-345);
  outputs are the raw lateral+topdown sums
* level set parameterized by REID.FPN_NUM in {2,3,4}, coarse->fine
  (FPN_reid.py:403-428)

Parameter names keep the reference blob naming (fpn_inner_res5_2_sum_w, ...)
so checkpoints interoperate and the 'fpn' marker LR group
(reference optimizer.py:133-151) classifies them.
"""

import jax
import jax.numpy as jnp
import numpy as np

# last block index per stage for each depth (reference FpnLevelInfo tables,
# FPN_reid.py:403-444)
_LAST_BLOCK = {
    50: {'res2': 2, 'res3': 3, 'res4': 5, 'res5': 2},
    101: {'res2': 2, 'res3': 3, 'res4': 22, 'res5': 2},
    152: {'res2': 2, 'res3': 7, 'res4': 35, 'res5': 2},
}
_STAGE_DIMS = {'res5': 2048, 'res4': 1024, 'res3': 512, 'res2': 256}


def fpn_spec(cfg, depth=50):
    """Static FPN description: levels coarse->fine."""
    assert cfg.RESNETS.RES5_STRIDE == 1, (
        'the re-ID FPN variant assumes last-stride-1 (FPN_reid.py:403-422)')
    fpn_num = cfg.REID.FPN_NUM
    assert fpn_num in (2, 3, 4), fpn_num
    stages = ['res5', 'res4', 'res3', 'res2'][:fpn_num]
    scales = [1. / 16., 1. / 16., 1. / 8., 1. / 4.][:fpn_num]
    blobs = ['{}_{}_sum'.format(s, _LAST_BLOCK[depth][s]) for s in stages]
    use_gn = bool(cfg.FPN.USE_GN)
    gn_groups = 0
    if use_gn:
        from pps_tpu.models.heads import _get_group_gn
        gn_groups = _get_group_gn(cfg, cfg.FPN.DIM)
    return {
        'fpn_dim': cfg.FPN.DIM,
        'stages': stages,
        'blobs': blobs,
        'dims': [_STAGE_DIMS[s] for s in stages],
        'spatial_scales': scales,
        'fpn_num': fpn_num,
        'zero_init_lateral': cfg.FPN.ZERO_INIT_LATERAL,
        # ConvGN on the COARSEST 1x1 only (reference FPN_reid.py:145-159);
        # laterals always use SpatialBN+ReLU (FPN_reid.py:340-347)
        'use_gn': use_gn,
        'gn_groups': gn_groups,
        'gn_eps': cfg.GROUP_NORM.EPSILON,
    }


def _xavier_conv(rng, c_in, c_out, zero=False):
    """Caffe2 XavierFill for a 1x1 conv: uniform(+-sqrt(3/fan_in))."""
    if zero:
        return jnp.zeros((c_in, c_out), jnp.float32)
    lim = np.sqrt(3.0 / c_in)
    return jax.random.uniform(rng, (c_in, c_out), jnp.float32, -lim, lim)


def _add_conv_bn(rngs, params, state, name, c_in, c_out, zero=False,
                 use_gn=False):
    params[name + '_w'] = _xavier_conv(next(rngs), c_in, c_out, zero=zero)
    if use_gn:
        # C2 ConvGN: bias-free conv (no_conv_bias=1, detector.py:449-489)
        # + SpatialGN params {name}_gn_s/_b, no running stats
        params[name + '_gn_s'] = jnp.ones((c_out,), jnp.float32)
        params[name + '_gn_b'] = jnp.zeros((c_out,), jnp.float32)
    else:
        params[name + '_b'] = jnp.zeros((c_out,), jnp.float32)
        params[name + '_bn_s'] = jnp.ones((c_out,), jnp.float32)
        params[name + '_bn_b'] = jnp.zeros((c_out,), jnp.float32)
        state[name + '_bn_rm'] = jnp.zeros((c_out,), jnp.float32)
        state[name + '_bn_riv'] = jnp.ones((c_out,), jnp.float32)


def init_fpn_params(rng, spec):
    def rng_iter(key):
        while True:
            key, sub = jax.random.split(key)
            yield sub

    rngs = rng_iter(rng)
    params, state = {}, {}
    dim = spec['fpn_dim']
    # coarsest 1x1 — unless dims[0] == FPN.DIM, where the reference
    # passes res5 straight through with no conv (FPN_reid.py:143-144)
    if spec['dims'][0] != dim:
        _add_conv_bn(rngs, params, state, 'fpn_inner_' + spec['blobs'][0],
                     spec['dims'][0], dim, use_gn=spec.get('use_gn', False))
    for i in range(1, spec['fpn_num']):
        if spec['dims'][i] != dim:
            # laterals are always Conv+SpatialBN+ReLU, even under
            # FPN.USE_GN (reference FPN_reid.py:340-347)
            _add_conv_bn(rngs, params, state,
                         'fpn_inner_' + spec['blobs'][i] + '_lateral',
                         spec['dims'][i], dim,
                         zero=spec['zero_init_lateral'])
    return params, state


def _conv1x1_bn_relu(params, state, updates, name, x, train):
    from pps_tpu.models.resnet import batch_norm
    w = params[name + '_w']
    y = jnp.einsum('bhwc,cd->bhwd', x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32)
    if not train and (name + '_fb') in params:
        # BN pre-folded into the conv (models/folding.py): bias only
        return jax.nn.relu(y + params[name + '_fb'])
    y = y + params[name + '_b']
    y, upd = batch_norm(
        y, {'_s': params[name + '_bn_s'], '_b': params[name + '_bn_b']},
        {'_rm': state[name + '_bn_rm'],
         '_riv': state[name + '_bn_riv']},
        '', train)
    for k, v in upd.items():
        updates[name + '_bn' + k] = v
    return jax.nn.relu(y)


def _conv1x1_gn(params, name, x, spec):
    """Reference ConvGN: bias-free 1x1 conv + GroupNorm, NO ReLU
    (FPN_reid.py:145-159 coarsest-level USE_GN branch;
    detector.py:449-489)."""
    from pps_tpu.models.resnet import group_norm
    y = jnp.einsum('bhwc,cd->bhwd', x.astype(jnp.float32),
                   params[name + '_w'],
                   preferred_element_type=jnp.float32)
    return group_norm(y, params[name + '_gn_s'], params[name + '_gn_b'],
                      spec['gn_groups'], spec['gn_eps'])


def _upsample2x(x):
    """Nearest-neighbor 2x (C2 UpsampleNearest)."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


def apply_fpn(params, state, stage_feats, spec, train=False):
    """stage_feats: {res2..res5 -> NHWC} from apply_resnet(return_stages).

    Returns (pyramid list coarse->fine of [B, H_l, W_l, fpn_dim], updates).
    """
    updates = {}
    dim = spec['fpn_dim']
    coarse_name = 'fpn_inner_' + spec['blobs'][0]
    coarse_in = stage_feats[spec['stages'][0]]
    if spec['dims'][0] == dim:
        # reference pass-through: no conv at all (FPN_reid.py:143-144)
        out = [coarse_in.astype(jnp.float32)]
    elif spec.get('use_gn'):
        out = [_conv1x1_gn(params, coarse_name, coarse_in, spec)]
    else:
        out = [_conv1x1_bn_relu(params, state, updates, coarse_name,
                                coarse_in, train)]
    for i in range(1, spec['fpn_num']):
        lateral_in = stage_feats[spec['stages'][i]]
        if spec['dims'][i] != dim:
            lat = _conv1x1_bn_relu(
                params, state, updates,
                'fpn_inner_' + spec['blobs'][i] + '_lateral',
                lateral_in, train)
        else:
            lat = lateral_in.astype(jnp.float32)
        td = out[i - 1]
        # res5->res4: both 1/16 when RES5_STRIDE=1 -> no upsample
        if spec['spatial_scales'][i] != spec['spatial_scales'][i - 1]:
            td = _upsample2x(td)
        out.append(lat + td)
    return out, updates
