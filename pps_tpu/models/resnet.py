"""ResNet-50/101/152 conv body, TPU-native.

Re-implements the capability of the reference graph builder
(/root/reference/detectron/modeling/ResNet.py) as pure jax functions over a
flat param pytree.  Design choices (deliberately different from the Caffe2
port):

* Activations are NHWC and kernels HWIO — the layouts XLA:TPU tiles best —
  instead of the reference's NCHW/OIHW.
* Params live in a flat ``{name: array}`` dict whose keys are exactly the
  reference's unscoped blob names (``conv1_w``, ``res2_0_branch2a_w``,
  ``res2_0_branch2a_bn_s`` ...; naming from reference ResNet.py:246-251,
  267-334 and tools/pickle_caffe_blobs_keep_bn.py:75-88).  This makes the
  Caffe2-pkl converter a pure name/layout map and keeps per-param LR-group
  selection (reference modeling/optimizer.py:133-151) trivially compatible.
* BN running stats (``*_bn_rm``/``*_bn_riv``) live in a separate ``state``
  dict so the train step stays a pure function.

Re-ID specific knobs honored: ``RESNETS.RES5_STRIDE`` / ``RES5_DILATION``
(last-stride-1 trick, reference ResNet.py:111-127) and ``TRAIN.FREEZE_AT``.
"""

import jax
import jax.numpy as jnp
import numpy as np

BN_EPSILON = 1e-5  # Caffe2 SpatialBN default epsilon
BN_MOMENTUM = 0.9  # Caffe2 SpatialBN default momentum


# ---------------------------------------------------------------------------
# Block structure
# ---------------------------------------------------------------------------

BLOCK_COUNTS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def resnet_spec(cfg, depth=50):
    """Static description of the conv body derived from cfg.

    Returns a dict with per-stage block counts, strides, dilations and the
    final spatial scale (reference ResNet.py:91-151).
    """
    n1, n2, n3, n4 = BLOCK_COUNTS[depth]
    res5_stride = cfg.RESNETS.RES5_STRIDE
    res5_dilation = cfg.RESNETS.RES5_DILATION
    spec = {
        'depth': depth,
        'num_groups': cfg.RESNETS.NUM_GROUPS,
        'width_per_group': cfg.RESNETS.WIDTH_PER_GROUP,
        'stride_1x1': cfg.RESNETS.STRIDE_1X1,
        'stages': [
            # (name, n_blocks, dim_out, dim_inner, stride, dilation)
            ('res2', n1, 256, cfg.RESNETS.NUM_GROUPS *
             cfg.RESNETS.WIDTH_PER_GROUP, 1, 1),
            ('res3', n2, 512, cfg.RESNETS.NUM_GROUPS *
             cfg.RESNETS.WIDTH_PER_GROUP * 2, 2, 1),
            ('res4', n3, 1024, cfg.RESNETS.NUM_GROUPS *
             cfg.RESNETS.WIDTH_PER_GROUP * 4, 2, 1),
            ('res5', n4, 2048, cfg.RESNETS.NUM_GROUPS *
             cfg.RESNETS.WIDTH_PER_GROUP * 8, res5_stride, res5_dilation),
        ],
        # stem stride 4 (conv /2 + pool /2), res3 /2, res4 /2, res5 cfg'd
        'spatial_scale': 1.0 / (4 * 1 * 2 * 2 * res5_stride) * res5_dilation,
        'dim_out': 2048,
        'freeze_at': cfg.TRAIN.FREEZE_AT,
        'dtype': cfg.MODEL.DTYPE,
        # GroupNorm body (MODEL.USE_GN; reference ResNet.py:223-238,340-395
        # + utils/net.py:291-305 get_group_gn)
        'use_gn': bool(cfg.MODEL.USE_GN),
        # MODEL.USE_BN=False -> AffineChannel: y = x*s + b with NO
        # normalization and no running stats — the reference's
        # small-minibatch mode where the BN statistics are pre-folded
        # into the loaded weights (reference detector.py:82-109).
        # Same _bn_s/_bn_b param names as SpatialBN; ignored under GN
        # (the GN body uses ConvGN regardless, as in the reference).
        'use_affine': not bool(cfg.MODEL.USE_BN),
        'gn_dim_per_gp': cfg.GROUP_NORM.DIM_PER_GP,
        'gn_num_groups': cfg.GROUP_NORM.NUM_GROUPS,
        'gn_eps': cfg.GROUP_NORM.EPSILON,
    }
    return spec


def get_group_gn(dim, dim_per_gp, num_groups):
    """Number of GroupNorm groups for `dim` channels (reference
    utils/net.py:291-305) — the single implementation; heads/fpn wrap it."""
    assert dim_per_gp == -1 or num_groups == -1, \
        'GroupNorm: can only specify G or C/G.'
    if dim_per_gp > 0:
        assert dim % dim_per_gp == 0
        return dim // dim_per_gp
    assert dim % num_groups == 0
    return num_groups


def _gn_groups(spec, dim):
    return get_group_gn(dim, spec['gn_dim_per_gp'], spec['gn_num_groups'])


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _msra_fill(rng, shape):
    """He-normal fan_out init (Caffe2 MSRAFill) for HWIO conv kernels."""
    kh, kw, _, c_out = shape
    fan_out = kh * kw * c_out
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(rng, shape, dtype=jnp.float32) * std


def _init_conv_bn(rngs, params, state, name, kh, kw, c_in, c_out,
                  use_gn=False, use_affine=False):
    params[name + '_w'] = _msra_fill(next(rngs), (kh, kw, c_in, c_out))
    if use_gn:  # ConvGN: no running stats (reference detector.py:449-489)
        params[name + '_gn_s'] = jnp.ones((c_out,), jnp.float32)
        params[name + '_gn_b'] = jnp.zeros((c_out,), jnp.float32)
        return
    params[name + '_bn_s'] = jnp.ones((c_out,), jnp.float32)
    params[name + '_bn_b'] = jnp.zeros((c_out,), jnp.float32)
    if use_affine:  # AffineChannel: no stats (reference detector.py:90-109)
        return
    state[name + '_bn_rm'] = jnp.zeros((c_out,), jnp.float32)
    state[name + '_bn_riv'] = jnp.ones((c_out,), jnp.float32)


def init_resnet_params(rng, spec):
    """Create randomly-initialized params/state for the conv body."""
    def rng_iter(key):
        while True:
            key, sub = jax.random.split(key)
            yield sub

    rngs = rng_iter(rng)
    use_gn = spec.get('use_gn', False)
    use_affine = spec.get('use_affine', False) and not use_gn
    params, state = {}, {}
    # stem: conv1 7x7/2 + bn (named res_conv1_bn; reference ResNet.py:246-251)
    # GN stem names its norm conv1_gn (reference ResNet.py:258-268)
    params['conv1_w'] = _msra_fill(next(rngs), (7, 7, 3, 64))
    if use_gn:
        params['conv1_gn_s'] = jnp.ones((64,), jnp.float32)
        params['conv1_gn_b'] = jnp.zeros((64,), jnp.float32)
    else:
        params['res_conv1_bn_s'] = jnp.ones((64,), jnp.float32)
        params['res_conv1_bn_b'] = jnp.zeros((64,), jnp.float32)
        if not use_affine:
            state['res_conv1_bn_rm'] = jnp.zeros((64,), jnp.float32)
            state['res_conv1_bn_riv'] = jnp.ones((64,), jnp.float32)

    dim_in = 64
    for (stage, n_blocks, dim_out, dim_inner, _stride, _dil) in spec['stages']:
        for i in range(n_blocks):
            prefix = '{}_{}'.format(stage, i)
            if i == 0 and dim_in != dim_out:
                _init_conv_bn(rngs, params, state, prefix + '_branch1',
                              1, 1, dim_in, dim_out, use_gn=use_gn,
                              use_affine=use_affine)
            _init_conv_bn(rngs, params, state, prefix + '_branch2a',
                          1, 1, dim_in, dim_inner, use_gn=use_gn,
                          use_affine=use_affine)
            _init_conv_bn(rngs, params, state, prefix + '_branch2b',
                          3, 3, dim_inner // spec['num_groups'], dim_inner,
                          use_gn=use_gn, use_affine=use_affine)
            _init_conv_bn(rngs, params, state, prefix + '_branch2c',
                          1, 1, dim_inner, dim_out, use_gn=use_gn,
                          use_affine=use_affine)
            dim_in = dim_out
    return params, state


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def conv2d(x, w, stride=1, dilation=1, padding='SAME_LOWER', dtype=None,
           groups=1):
    """NHWC conv. ``SAME_LOWER`` = explicit symmetric pad matching Caffe2's
    pad=k//2 convention (identical to XLA SAME for odd kernels and stride 1;
    we pass explicit pads so stride-2 matches Caffe2 exactly).  groups > 1 =
    ResNeXt grouped convolution (reference ResNet.py:276-343 group arg)."""
    kh, kw = w.shape[0], w.shape[1]
    ph = ((kh - 1) * dilation) // 2
    pw = ((kw - 1) * dilation) // 2
    if dtype is not None and dtype != jnp.float32:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
    )


def conv2d_int8(x, wq, xinv, osc, fb, stride=1, dilation=1, groups=1,
                dtype=None):
    """Quantized NHWC conv for the int8 PTQ serving path
    (models/quantize.py): s8 x s8 -> s32 on the MXU (2x bf16 peak on
    v5e-class chips), then a fused dequant epilogue.

    x is bf16/f32; xinv = 1/input_scale — a scalar (BN-folded bodies)
    or a [C_in] vector (GN bodies: per-input-channel scales, already
    absorbed into the weights by models/quantize.py, so osc stays
    per-output-channel).  wq int8 HWIO with per-output-channel scales
    in osc, fb = the BN-folded bias (models/folding.py).  Same
    SAME_LOWER pad convention as conv2d.
    """
    kh, kw = wq.shape[0], wq.shape[1]
    ph = ((kh - 1) * dilation) // 2
    pw = ((kw - 1) * dilation) // 2
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * xinv),
                  -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    yf = y.astype(jnp.float32) * osc + fb
    return yf.astype(dtype if dtype is not None else x.dtype)


def batch_norm(x, params, state, name, train, stats_axes=(0, 1, 2)):
    """SpatialBN with Caffe2 semantics (eps 1e-5, momentum 0.9, biased batch
    variance).  Returns (y, state_updates) where state_updates is {} in eval
    mode.  x is NHWC (or [..., C]); stats are over all axes but the last."""
    s = params[name + '_s']
    b = params[name + '_b']
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=stats_axes)
        var = jnp.mean(jnp.square(xf), axis=stats_axes) - jnp.square(mean)
        var = jnp.maximum(var, 0.0)
        updates = {
            name + '_rm': BN_MOMENTUM * state[name + '_rm'] +
            (1.0 - BN_MOMENTUM) * mean,
            name + '_riv': BN_MOMENTUM * state[name + '_riv'] +
            (1.0 - BN_MOMENTUM) * var,
        }
    else:
        mean = state[name + '_rm']
        var = state[name + '_riv']
        updates = {}
    inv = jax.lax.rsqrt(var + BN_EPSILON) * s
    y = (x.astype(jnp.float32) - mean) * inv + b
    return y.astype(x.dtype), updates


def group_norm(x, s, b, groups, eps=1e-5):
    """GroupNorm over an NHWC map (reference SpatialGN via ConvGN,
    detector.py:449-489); stats in f32, no running state."""
    n, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = xg.reshape(n, h, w, c) * s + b
    return y.astype(x.dtype)


def _conv_bn(x, params, state, updates, name, train, stride=1, dilation=1,
             dtype=None, groups=1, spec=None):
    if not train:
        if spec is not None and spec.get('calibrate'):
            # int8 PTQ calibration capture (models/quantize.py): record
            # the PER-CHANNEL absmax of this conv's input through the
            # updates thread (quantize_body reduces it to one scalar for
            # BN-folded bodies; GN bodies keep the vector to fold
            # per-channel activation scales into the weights)
            updates['__amax__' + name] = jnp.max(
                jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))
        if (name + '_wq') in params:
            if spec is not None and spec.get('use_gn'):
                # GN body: GN is input-dependent (not foldable), so the
                # quantized conv carries fb=0 and GN runs on the
                # dequantized output (models/quantize.py)
                y = conv2d_int8(
                    x, params[name + '_wq'], params[name + '_xinv'],
                    params[name + '_osc'], params[name + '_fb'],
                    stride=stride, dilation=dilation, groups=groups,
                    dtype=dtype)
                return group_norm(
                    y, params[name + '_gn_s'], params[name + '_gn_b'],
                    _gn_groups(spec, y.shape[-1]), spec['gn_eps'])
            # int8 serving path: BN folded into (_wq, _osc, _fb)
            return conv2d_int8(
                x, params[name + '_wq'], params[name + '_xinv'],
                params[name + '_osc'], params[name + '_fb'],
                stride=stride, dilation=dilation, groups=groups,
                dtype=dtype)
    y = conv2d(x, params[name + '_w'], stride=stride, dilation=dilation,
               dtype=dtype, groups=groups)
    if spec is not None and spec.get('use_gn'):
        return group_norm(y, params[name + '_gn_s'], params[name + '_gn_b'],
                          _gn_groups(spec, y.shape[-1]), spec['gn_eps'])
    if not train and (name + '_fb') in params:
        # BN pre-folded into the conv (models/folding.py): add bias only
        return y + params[name + '_fb'].astype(y.dtype)
    if spec is not None and spec.get('use_affine'):
        # AffineChannel: y*s + b, no normalization (reference
        # detector.py:90-109; stats live pre-folded in the weights)
        yf = y.astype(jnp.float32) * params[name + '_bn_s'] + \
            params[name + '_bn_b']
        return yf.astype(y.dtype)
    y, upd = batch_norm(y, {'_s': params[name + '_bn_s'],
                            '_b': params[name + '_bn_b']},
                        {'_rm': state[name + '_bn_rm'],
                         '_riv': state[name + '_bn_riv']},
                        '', train)
    for k, v in upd.items():
        updates[name + '_bn' + k] = v
    return y


def bottleneck_block(x, params, state, updates, prefix, stride, dilation,
                     stride_1x1, train, dtype=None, groups=1, spec=None):
    """1x1 -> 3x3 -> 1x1 bottleneck (reference ResNet.py:276-343)."""
    str1, str3 = (stride, 1) if stride_1x1 else (1, stride)

    shortcut = x
    if (prefix + '_branch1_w') in params or \
            (prefix + '_branch1_wq') in params:
        shortcut = _conv_bn(x, params, state, updates, prefix + '_branch1',
                            train, stride=stride, dtype=dtype, spec=spec)

    cur = _conv_bn(x, params, state, updates, prefix + '_branch2a', train,
                   stride=str1, dtype=dtype, spec=spec)
    cur = jax.nn.relu(cur)
    cur = _conv_bn(cur, params, state, updates, prefix + '_branch2b', train,
                   stride=str3, dilation=dilation, dtype=dtype,
                   groups=groups, spec=spec)
    cur = jax.nn.relu(cur)
    cur = _conv_bn(cur, params, state, updates, prefix + '_branch2c', train,
                   stride=1, dtype=dtype, spec=spec)
    return jax.nn.relu(cur + shortcut)


def max_pool_3x3_s2(x):
    """kernel 3, stride 2, pad 1 (Caffe2 pool1; reference ResNet.py:250)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def apply_resnet(params, state, x, spec, train=False,
                 return_stages=False):
    """Run the conv body.

    Args:
      params / state: flat dicts (see module docstring).
      x: [N, H, W, 3] mean-subtracted BGR image batch.
      train: batch-stat BN + state updates when True.
      return_stages: also return {res2..res5} intermediate features (for FPN).

    Returns:
      (features, state_updates) where features is the res5 NHWC map, or
      (features, stages, state_updates) with return_stages.
    """
    dtype = {'bfloat16': jnp.bfloat16, 'float32': jnp.float32}[
        spec.get('dtype', 'float32')]
    updates = {}
    if not train and spec.get('calibrate'):
        updates['__amax__conv1'] = jnp.max(
            jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))
    if not train and 'conv1_wq' in params:
        cur = conv2d_int8(x, params['conv1_wq'], params['conv1_xinv'],
                          params['conv1_osc'], params['conv1_fb'],
                          stride=2, dtype=dtype)
        if spec.get('use_gn'):
            cur = group_norm(cur, params['conv1_gn_s'],
                             params['conv1_gn_b'],
                             _gn_groups(spec, 64), spec['gn_eps'])
        cur = jax.nn.relu(cur)
        cur = max_pool_3x3_s2(cur)
        if spec['freeze_at'] == 1:
            cur = jax.lax.stop_gradient(cur)
        return _apply_stages(params, state, cur, spec, train, dtype,
                             updates, return_stages)
    cur = conv2d(x, params['conv1_w'], stride=2, dtype=dtype)
    if spec.get('use_gn'):
        cur = group_norm(cur, params['conv1_gn_s'], params['conv1_gn_b'],
                         _gn_groups(spec, 64), spec['gn_eps'])
    elif not train and 'conv1_fb' in params:
        cur = cur + params['conv1_fb'].astype(cur.dtype)
    elif spec.get('use_affine'):
        cur = (cur.astype(jnp.float32) * params['res_conv1_bn_s'] +
               params['res_conv1_bn_b']).astype(cur.dtype)
    else:
        cur, upd = batch_norm(
            cur,
            {'_s': params['res_conv1_bn_s'],
             '_b': params['res_conv1_bn_b']},
            {'_rm': state['res_conv1_bn_rm'],
             '_riv': state['res_conv1_bn_riv']},
            '', train)
        for k, v in upd.items():
            updates['res_conv1_bn' + k] = v
    cur = jax.nn.relu(cur)
    cur = max_pool_3x3_s2(cur)
    if spec['freeze_at'] == 1:
        cur = jax.lax.stop_gradient(cur)
    return _apply_stages(params, state, cur, spec, train, dtype, updates,
                         return_stages)


def _apply_stages(params, state, cur, spec, train, dtype, updates,
                  return_stages):
    stages = {}
    for si, (stage, n_blocks, _dim_out, _dim_inner, stride,
             dilation) in enumerate(spec['stages']):
        for i in range(n_blocks):
            prefix = '{}_{}'.format(stage, i)
            cur = bottleneck_block(
                cur, params, state, updates, prefix,
                stride=stride if i == 0 else 1,
                dilation=dilation,
                stride_1x1=spec['stride_1x1'],
                train=train, dtype=dtype,
                groups=spec['num_groups'], spec=spec)
        stages[stage] = cur
        # reference freezes by StopGradient at stage boundaries
        # (FREEZE_AT semantics, reference ResNet.py:100-108)
        if spec['freeze_at'] == si + 2:
            cur = jax.lax.stop_gradient(cur)
            stages[stage] = cur

    if return_stages:
        return cur, stages, updates
    return cur, updates
