"""Solver unit tests: LR policies + the three SGD update flavors vs
hand-computed numpy (the reference's update rules, modeling/optimizer.py
/ optimizer_pt.py / ops/acm_weightdecay_momentum_sgd_op.h)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pps_tpu.config import cfg, merge_cfg_from_list
from pps_tpu.solver import lr_policy
from pps_tpu.solver import optimizer as opt_lib


def test_steps_with_decay_epoch_indexed():
    merge_cfg_from_list([
        'SOLVER.LR_POLICY', 'steps_with_decay',
        'SOLVER.BASE_LR', '0.01', 'SOLVER.GAMMA', '0.5',
        'SOLVER.STEPS', '[0, 50, 60]', 'SOLVER.WARM_UP_ITERS', '0'])
    assert lr_policy.get_lr_at_iter(cfg, 0, 0, 100) == np.float32(0.01)
    assert lr_policy.get_lr_at_iter(cfg, 4900, 49, 100) == np.float32(0.01)
    assert lr_policy.get_lr_at_iter(cfg, 5000, 50, 100) == np.float32(0.005)
    np.testing.assert_allclose(
        lr_policy.get_lr_at_iter(cfg, 6000, 60, 100), 0.0025)


def test_warmup_linear():
    merge_cfg_from_list([
        'SOLVER.LR_POLICY', 'steps_with_decay',
        'SOLVER.BASE_LR', '0.01', 'SOLVER.GAMMA', '0.5',
        'SOLVER.STEPS', '[0]',
        'SOLVER.WARM_UP_ITERS', '2', 'SOLVER.WARM_UP_METHOD', 'linear',
        'SOLVER.WARM_UP_FACTOR', '0.1'])
    ep_size = 10
    lr0 = lr_policy.get_lr_at_iter(cfg, 0, 0, ep_size)
    np.testing.assert_allclose(lr0, 0.001, rtol=1e-6)  # factor at alpha=0
    lr_mid = lr_policy.get_lr_at_iter(cfg, 10, 1, ep_size)
    np.testing.assert_allclose(lr_mid, 0.01 * (0.1 * 0.5 + 0.5), rtol=1e-6)
    lr_done = lr_policy.get_lr_at_iter(cfg, 25, 2, ep_size)
    np.testing.assert_allclose(lr_done, 0.01, rtol=1e-6)


def _tiny_setup(flavor='standard', iter_size=1):
    params = {'res2_w': jnp.asarray([1.0, 2.0]),
              'res2_b': jnp.asarray([0.5]),
              'pps_conv_w': jnp.asarray([1.0]),
              'pps_fc_w': jnp.asarray([2.0])}
    meta = {  # (lr_scale, is_bias, wd)
        'res2_w': (1.0, False, 0.1),
        'res2_b': (1.0, True, 0.0),
        'pps_conv_w': (10.0, False, 0.1),
        'pps_fc_w': (20.0, False, 0.1),
    }
    grads = {k: jnp.ones_like(v) for k, v in params.items()}
    opt = opt_lib.init_opt_state(params, flavor=flavor, iter_size=iter_size)
    return params, meta, grads, opt


def test_classify_param_groups():
    assert opt_lib.classify_param('res2_0_branch2a_w', 10., 20.) == (1.0,
                                                                     False)
    assert opt_lib.classify_param('res2_0_branch2a_bn_b', 10., 20.)[1]
    assert opt_lib.classify_param('pps_conv_w', 10., 20.) == (10.0, False)
    assert opt_lib.classify_param('pps_fc_w', 10., 20.) == (20.0, False)
    assert opt_lib.classify_param('crm_fc8c_w', 10., 20.) == (20.0, False)
    assert opt_lib.classify_param('fpn_inner_res5_2_sum_w', 10., 20.) == (
        10.0, False)


def test_sgd_standard_two_steps():
    """C2 MomentumSGDUpdate: v = mu v + lr g_eff; p -= v; bias grads x2,
    weight decay added to non-bias grads (reference optimizer.py:112-157)."""
    params, meta, grads, opt = _tiny_setup()
    lr, mu = 0.1, 0.9
    p1, o1 = opt_lib.sgd_update(params, grads, opt, lr, meta, momentum=mu)
    # res2_w: g_eff = 1 + 0.1*p
    g0 = 1 + 0.1 * np.array([1.0, 2.0])
    v1 = lr * g0
    np.testing.assert_allclose(p1['res2_w'], np.array([1.0, 2.0]) - v1,
                               rtol=1e-6)
    # bias: g_eff = 2*1, no wd
    np.testing.assert_allclose(p1['res2_b'], 0.5 - lr * 2.0, rtol=1e-6)
    # new-param 10x lr
    np.testing.assert_allclose(p1['pps_conv_w'],
                               1.0 - lr * 10 * (1 + 0.1 * 1.0), rtol=1e-6)
    # second step accumulates momentum
    p2, o2 = opt_lib.sgd_update(p1, grads, o1, lr, meta, momentum=mu)
    g1 = 1 + 0.1 * np.asarray(p1['res2_w'])
    v2 = mu * v1 + lr * g1
    np.testing.assert_allclose(p2['res2_w'], np.asarray(p1['res2_w']) - v2,
                               rtol=1e-6)


def test_sgd_pt_flavor():
    """caffe/pytorch momentum: v = mu v + g_eff; p -= lr v
    (reference momentum_sgd_pt_op.h:7-29)."""
    params, meta, grads, opt = _tiny_setup(flavor='pt')
    lr, mu = 0.1, 0.9
    p1, o1 = opt_lib.sgd_update(params, grads, opt, lr, meta, momentum=mu,
                                flavor='pt')
    g0 = 1 + 0.1 * np.array([1.0, 2.0])
    np.testing.assert_allclose(p1['res2_w'], np.array([1.0, 2.0]) - lr * g0,
                               rtol=1e-6)
    p2, _ = opt_lib.sgd_update(p1, grads, o1, lr, meta, momentum=mu,
                               flavor='pt')
    g1 = 1 + 0.1 * np.asarray(p1['res2_w'])
    v2 = mu * g0 + g1
    np.testing.assert_allclose(p2['res2_w'],
                               np.asarray(p1['res2_w']) - lr * v2, rtol=1e-6)


def test_sgd_iter_accumulation():
    """ACM flavor: grads accumulate for iter_size steps; params only move
    on the boundary step, normalized by 1/(iter_size*num_devices)
    (reference acm_weightdecay_momentum_sgd_op.h:47-113)."""
    params, meta, grads, opt = _tiny_setup(flavor='iter', iter_size=2)
    lr = 0.1
    p1, o1 = opt_lib.sgd_update(params, grads, opt, lr, meta,
                                flavor='iter', iter_size=2, num_devices=1)
    # step 1 of 2: no movement
    np.testing.assert_allclose(p1['res2_w'], params['res2_w'])
    p2, o2 = opt_lib.sgd_update(p1, grads, o1, lr, meta,
                                flavor='iter', iter_size=2, num_devices=1)
    # boundary: g = (1+1)/2 = 1, + wd*p; v = lr * 1 * g_eff
    g = 1.0 + 0.1 * np.array([1.0, 2.0])
    np.testing.assert_allclose(p2['res2_w'], np.array([1.0, 2.0]) - lr * g,
                               rtol=1e-6)
    # accumulator reset after apply
    np.testing.assert_allclose(np.asarray(o2['acmgrad']['res2_w']), 0.0)


def test_correct_momentum():
    params, meta, grads, opt = _tiny_setup()
    _, o1 = opt_lib.sgd_update(params, grads, opt, 0.1, meta)
    o2 = opt_lib.correct_momentum(o1, 0.5)
    np.testing.assert_allclose(np.asarray(o2['momentum']['res2_b']),
                               np.asarray(o1['momentum']['res2_b']) * 0.5)
    assert opt_lib.get_lr_change_ratio(0.1, 0.05) == pytest.approx(2.0)


def test_warmup_trajectory_matches_reference_formula():
    """Full LR sequence fixture for the reference's subtlest schedule quirk:
    warm-up GATES on epoch (`ep < WARM_UP_ITERS`) but the linear alpha is
    indexed by raw ITERATION (reference utils/lr_policy.py:28-43, called as
    get_lr_at_iter(cur_iter, cur_ep, num_iter_per_epoch) from
    utils/train.py:84)."""
    merge_cfg_from_list([
        'SOLVER.LR_POLICY', 'steps_with_decay',
        'SOLVER.BASE_LR', '0.02', 'SOLVER.GAMMA', '0.5',
        'SOLVER.STEPS', '[0, 2]', 'SOLVER.MAX_ITER', '3',
        'SOLVER.WARM_UP_ITERS', '2', 'SOLVER.WARM_UP_METHOD', 'linear',
        'SOLVER.WARM_UP_FACTOR', '0.25'])
    ep_size = 4
    got = [float(lr_policy.get_lr_at_iter(cfg, it, it // ep_size, ep_size))
           for it in range(3 * ep_size)]

    # the reference formula, written out independently
    expected = []
    for it in range(3 * ep_size):
        ep = it // ep_size
        base = 0.02 * 0.5 ** (1 if ep >= 2 else 0)  # steps at epoch {0, 2}
        if ep < 2:  # epoch-gated warm-up window
            alpha = it / (2 * ep_size)  # iteration-indexed alpha
            base *= 0.25 * (1 - alpha) + alpha
        expected.append(base)
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # spot values: warmup spans ALL of epochs 0-1 and never reaches 1.0
    # inside the window (alpha=1 only at it == 2*ep_size, already epoch 2)
    np.testing.assert_allclose(got[0], 0.005, rtol=1e-6)
    assert got[2 * ep_size - 1] < 0.02  # last warm-up iter still scaled
    np.testing.assert_allclose(got[2 * ep_size], 0.01, rtol=1e-6)  # decayed


def test_gn_scale_weight_decay_group():
    merge_cfg_from_list(['SOLVER.WEIGHT_DECAY', '0.0005',
                         'SOLVER.WEIGHT_DECAY_GN', '0.0'])
    params = {'res2_0_branch2a_gn_s': jnp.ones(4),
              'res2_0_branch2a_gn_b': jnp.zeros(4),
              'res2_0_branch2a_w': jnp.ones((1, 1, 4, 4))}
    meta = opt_lib.make_param_meta(params, cfg)
    assert meta['res2_0_branch2a_gn_s'] == (1.0, False, 0.0)
    assert meta['res2_0_branch2a_gn_b'] == (1.0, True, 0.0)
    assert meta['res2_0_branch2a_w'] == (1.0, False, 0.0005)


def test_trainable_from_cfg_freeze_at():
    """TRAIN.FREEZE_AT stage-prefix map (reference ResNet.py:95-115 +
    optimizer.py:90-157: params below the freeze point get no update op)."""
    params = {
        'conv1_w': 0, 'conv1_gn_s': 0, 'res_conv1_bn_s': 0,
        'res2_0_branch2a_w': 0, 'res2_0_branch2a_bn_b': 0,
        'res3_0_branch1_w': 0, 'res4_5_branch2c_bn_s': 0,
        'res5_2_branch2b_w': 0, 'fpn_inner_res5_w': 0,
        'pps_conv_w': 0, 'pps_fc_w': 0, 'crm_fc8c_w': 0,
    }
    cfg.TRAIN.FREEZE_AT = 0
    assert opt_lib.trainable_from_cfg(cfg, params) is None

    cfg.TRAIN.FREEZE_AT = 2
    t = opt_lib.trainable_from_cfg(cfg, params)
    frozen = {k for k, v in t.items() if not v}
    assert frozen == {'conv1_w', 'conv1_gn_s', 'res_conv1_bn_s',
                      'res2_0_branch2a_w', 'res2_0_branch2a_bn_b'}

    cfg.TRAIN.FREEZE_AT = 5
    t = opt_lib.trainable_from_cfg(cfg, params)
    assert {k for k, v in t.items() if v} == {
        'fpn_inner_res5_w', 'pps_conv_w', 'pps_fc_w', 'crm_fc8c_w'}

    # FREEZE_CONV_BODY freezes the whole body incl. FPN laterals
    # (reference model_builder.py:255-257: StopGradient on blob_conv)
    cfg.TRAIN.FREEZE_AT = 0
    cfg.TRAIN.FREEZE_CONV_BODY = True
    t = opt_lib.trainable_from_cfg(cfg, params)
    assert {k for k, v in t.items() if v} == {
        'pps_conv_w', 'pps_fc_w', 'crm_fc8c_w'}


def test_sgd_update_trainable_passthrough():
    """Frozen params AND their momentum pass through bitwise unchanged
    (no weight decay, no momentum accumulation)."""
    params, meta, grads, opt = _tiny_setup()
    opt['momentum'] = {k: jnp.full_like(v, 0.25)
                       for k, v in params.items()}
    trainable = {'res2_w': False, 'res2_b': True,
                 'pps_conv_w': True, 'pps_fc_w': False}
    p1, o1 = opt_lib.sgd_update(params, grads, opt, 0.1, meta,
                                trainable=trainable)
    for k in ('res2_w', 'pps_fc_w'):
        np.testing.assert_array_equal(np.asarray(p1[k]),
                                      np.asarray(params[k]))
        np.testing.assert_array_equal(np.asarray(o1['momentum'][k]),
                                      np.asarray(opt['momentum'][k]))
    for k in ('res2_b', 'pps_conv_w'):
        assert not np.array_equal(np.asarray(p1[k]), np.asarray(params[k]))
