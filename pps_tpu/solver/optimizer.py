"""Momentum-SGD with Caffe2-Detectron update semantics, as pure jax.

Reproduces the three update flavors of the reference
(/root/reference/detectron/modeling/optimizer.py:90-157,
optimizer_iter.py:90-178, optimizer_pt.py:90-157) with the same per-param
LR-group classification:

* biases (names ending ``_b``): no weight decay, 2x learning rate
* "new" params (name contains bpm/apm/crm/ekc/pps/youtu/fpn): LR x
  ``SOLVER.LR_SCALE_NEW_PARAM``; their FC params: LR x ``SOLVER.LR_SCALE_NEW_FC``
* everything else: base LR + weight decay

Flavors (all keep momentum inside the state pytree):
  'standard'  v = mu v + lr (g_eff);             p -= v       (MomentumSGDUpdate)
  'pt'        v = mu v + g_eff;                  p -= lr v    (MomentumSGDUpdatePT)
  'iter'      accumulate g for ITER_SIZE steps, then normalize
              by 1/(iter_size * num_devices), add wd p, C2-style update
              (ACMWeightDecayMomentumSGDUpdate; the extra num_devices factor
              mirrors the reference's double-normalization quirk)

The momentum-correction on LR change (v *= new_lr/old_lr,
reference detector.py:539-559) is exposed as ``correct_momentum``.
"""

import jax
import jax.numpy as jnp

NEW_PARAM_MARKERS = ('bpm', 'apm', 'crm', 'ekc', 'pps', 'youtu')


def classify_param(name, lr_scale_new_param, lr_scale_new_fc):
    """Return (lr_scale, is_bias) for a parameter name.

    Mirrors the reference's string-matching group assignment
    (optimizer.py:133-151).
    """
    is_bias = name.endswith('_b')
    is_new = any(m in name for m in NEW_PARAM_MARKERS)
    if is_new and 'fc' in name:
        lr_scale = lr_scale_new_fc
    elif is_new or 'fpn' in name:
        lr_scale = lr_scale_new_param
    else:
        lr_scale = 1.0
    return lr_scale, is_bias


def make_param_meta(params, cfg):
    """Static per-param metadata: {name: (lr_scale, is_bias, wd)}."""
    meta = {}
    for name in params:
        lr_scale, is_bias = classify_param(
            name, cfg.SOLVER.LR_SCALE_NEW_PARAM, cfg.SOLVER.LR_SCALE_NEW_FC)
        if is_bias:
            wd = 0.0
        elif name.endswith('_gn_s'):
            # GroupNorm scales use SOLVER.WEIGHT_DECAY_GN (reference
            # optimizer.py:125-127; GN biases hit the bias branch first)
            wd = cfg.SOLVER.WEIGHT_DECAY_GN
        else:
            wd = cfg.SOLVER.WEIGHT_DECAY
        meta[name] = (lr_scale, is_bias, wd)
    return meta


def _frozen_prefixes(cfg):
    """Param-name prefixes below the freeze point.

    The reference stop-gradients the stage output (ResNet.py:100-108,
    freeze_at in [0,2,3,4,5]) and then builds SGD update ops only for
    params that received gradients (optimizer.py:90-157), so everything
    at or below the frozen stage is bit-frozen: no weight decay, no
    momentum.  TRAIN.FREEZE_CONV_BODY stop-gradients the body output
    (model_builder.py:255-257) freezing the whole conv body (with FPN_ON
    the laterals are inside add_conv_body_func, so they freeze too).
    """
    freeze_at = int(cfg.TRAIN.FREEZE_AT)
    assert freeze_at in (0, 1, 2, 3, 4, 5), freeze_at
    if cfg.TRAIN.FREEZE_CONV_BODY:
        return ('conv1', 'res_conv1_bn', 'res2_', 'res3_', 'res4_',
                'res5_', 'fpn_')
    if freeze_at == 0:
        return ()
    stem = ('conv1', 'res_conv1_bn')  # conv1_w + BN/GN stem params
    return stem + tuple('res%d_' % s for s in range(2, freeze_at + 1))


def trainable_from_cfg(cfg, params):
    """{name: bool} trainable map from TRAIN.FREEZE_AT /
    TRAIN.FREEZE_CONV_BODY, or None when nothing is frozen (fast path).

    Frozen params receive NO update at all — params and momentum pass
    through sgd_update bitwise unchanged, matching the reference's
    missing-update-op semantics.  BN running stats of frozen stages are
    NOT covered here: they are computed state, and the reference's
    train-mode SpatialBN keeps updating them in-graph even below the
    freeze point — ours do the same via the state pytree.
    """
    prefixes = _frozen_prefixes(cfg)
    if not prefixes:
        return None
    return {name: not name.startswith(prefixes) for name in params}


def init_opt_state(params, flavor='standard', iter_size=1):
    state = {'momentum': jax.tree.map(jnp.zeros_like, params)}
    if flavor == 'iter':
        state['acmgrad'] = jax.tree.map(jnp.zeros_like, params)
        state['count'] = jnp.zeros((), jnp.int32)
    return state


def flavor_from_cfg(cfg):
    if cfg.REID.ITER_SIZE > 1:
        return 'iter'
    if cfg.REID.SGD_PT:
        return 'pt'
    return 'standard'


def sgd_update(params, grads, opt_state, lr, meta, momentum=0.9,
               flavor='standard', iter_size=1, num_devices=1,
               trainable=None):
    """One optimizer step.  All array math is jit-traceable; ``meta``,
    ``flavor``, ``iter_size`` are static.

    trainable: optional {name: bool}; frozen params pass through unchanged
    (the FREEZE_AT analog of params missing from TrainableParams).
    """
    new_params, new_mom = {}, {}
    mom = opt_state['momentum']

    if flavor == 'iter':
        count = opt_state['count'] + 1
        apply_now = (count % iter_size) == 0
        new_acm = {}
        for name, p in params.items():
            if trainable is not None and not trainable.get(name, True):
                new_params[name] = p
                new_mom[name] = mom[name]
                new_acm[name] = opt_state['acmgrad'][name]
                continue
            lr_scale, _is_bias, wd = meta[name]
            lr_mult = 2.0 if _is_bias else 1.0
            acm = opt_state['acmgrad'][name] + grads[name]
            g = acm / float(iter_size * num_devices)
            g = g + wd * p
            v = momentum * mom[name] + lr * lr_scale * lr_mult * g
            new_params[name] = jnp.where(apply_now, p - v, p)
            new_mom[name] = jnp.where(apply_now, v, mom[name])
            new_acm[name] = jnp.where(apply_now, jnp.zeros_like(acm), acm)
        return new_params, {'momentum': new_mom, 'acmgrad': new_acm,
                            'count': count}

    for name, p in params.items():
        if trainable is not None and not trainable.get(name, True):
            new_params[name] = p
            new_mom[name] = mom[name]
            continue
        lr_scale, is_bias, wd = meta[name]
        g = grads[name]
        if is_bias:
            g = 2.0 * g  # bias 2x LR via grad scaling (optimizer.py:124)
        elif wd > 0:
            g = g + wd * p
        if flavor == 'standard':
            v = momentum * mom[name] + lr * lr_scale * g
            new_params[name] = p - v
        elif flavor == 'pt':
            v = momentum * mom[name] + g
            new_params[name] = p - lr * lr_scale * v
        else:
            raise ValueError(flavor)
        new_mom[name] = v
    return new_params, {'momentum': new_mom, **{
        k: v for k, v in opt_state.items() if k != 'momentum'}}


def correct_momentum(opt_state, factor):
    """Scale the update history when the LR changes
    (reference detector.py:539-559)."""
    out = dict(opt_state)
    out['momentum'] = jax.tree.map(
        lambda v: v * factor, opt_state['momentum'])
    return out


def get_lr_change_ratio(cur_lr, new_lr):
    eps = 1e-10
    return max((new_lr + eps) / (cur_lr + eps),
               (cur_lr + eps) / (new_lr + eps))
