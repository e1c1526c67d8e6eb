"""Ablation profile of the flagship training step on the attached TPU.

Times each slice of the per-iteration work (the reference runs the whole
DAG as one graph, utils/train.py:86; ours is one jitted step) so the
step-time breakdown in BASELINE.md is measured, not guessed:

  eval_fwd        folded-BN inference forward (the bench.py path)
  train_fwd       train_forward value only (batch-stat BN + losses)
  train_grad      value_and_grad of train_forward
  full_step       grad + SGD update (the shipped step)

Optionally writes an xprof trace per slice under --profile-dir.

Usage: python tools/profile_train_step.py [--batch 64] [--iters 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _time(fn, args, iters, warmup=3):
    """Slope timing via the shared tunnel-safe protocol
    (pps_tpu.utils.timer.slope_time; CLAUDE.md)."""
    from pps_tpu.utils.timer import slope_time
    return slope_time(lambda: fn(*args), iters=iters, warmup=warmup)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--profile-dir', default=None)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--depth', type=int, default=50, choices=(50, 101, 152),
                    help='ResNet body depth (reference BLOCK_COUNTS)')
    args = ap.parse_args()

    import jax
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    import jax.numpy as jnp
    import __graft_entry__ as g
    from pps_tpu.models.model import build_model
    from pps_tpu.models.folding import fold_conv_bn
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel import train_step as ts_lib
    from pps_tpu.solver import optimizer as opt_lib

    assert args.batch % 8 == 0, '--batch must be a multiple of 8 (P=8)'
    p = 8
    k = max(1, args.batch // 8)
    cfg = g._flagship_cfg(ims_per_batch=args.batch, p=p, k=k,
                          dtype=args.dtype, depth=args.depth)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    w, h = cfg.REID.SCALE
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randn(args.batch, h, w, 3).astype(np.float32))
    labels = np.tile(np.arange(p), (k, 1)).T.reshape(-1)[:args.batch]
    labels = labels.astype(np.int32)
    oh = np.zeros((args.batch, cfg.MODEL.NUM_CLASSES - 1), np.float32)
    oh[np.arange(args.batch), labels] = 1.0
    batch = {'data': images,
             'labels_int32': jax.device_put(labels),
             'labels_oh': jax.device_put(oh)}
    key = jax.random.PRNGKey(1)

    # model FLOP accounting (fwd conv+fc MACs x2), for MFU
    from pps_tpu.utils.flops import model_fwd_flops
    fwd_gf = model_fwd_flops(cfg) / 1e9

    results = {}

    def run(name, fn, fargs, flops_per_img):
        t = _time(fn, fargs, args.iters)
        tf_s = flops_per_img * args.batch / t / 1e3  # TFLOP/s
        results[name] = (t, tf_s)
        print('%-12s %7.2f ms  %6.1f TFLOP/s  (%5.0f imgs/s)'
              % (name, t * 1e3, tf_s, args.batch / t))
        if args.profile_dir:
            with jax.profiler.trace(args.profile_dir + '/' + name):
                for _ in range(3):
                    out = fn(*fargs)
                jax.block_until_ready(out)

    # 1. eval forward (BN folded into conv bias — the bench.py path)
    fp = fold_conv_bn(params, state)
    eval_fn = jax.jit(lambda p_, s_, x: model.extract_features(p_, s_, x))
    run('eval_fwd', eval_fn, (fp, state, images), fwd_gf)

    # 2. train forward only (batch-stat BN + CRM + triplet)
    fwd_fn = jax.jit(lambda p_, s_, b, r: model.train_forward(
        p_, s_, b, r, jnp.float32(1.0))[0])
    run('train_fwd', fwd_fn, (params, state, batch, key), fwd_gf)

    # 3. value_and_grad
    vg = jax.value_and_grad(model.train_forward, has_aux=True)
    grad_fn = jax.jit(lambda p_, s_, b, r: vg(
        p_, s_, b, r, jnp.float32(1.0))[1])
    run('train_grad', grad_fn, (params, state, batch, key), 3 * fwd_gf)

    # 4. the full shipped step (grad + SGD), donated
    mesh = mesh_lib.build_mesh(cfg)
    meta = opt_lib.make_param_meta(params, cfg)
    step = ts_lib.make_train_step(model, cfg, mesh, meta=meta)
    ts = {'params': params, 'state': state,
          'opt': opt_lib.init_opt_state(
              params, flavor=opt_lib.flavor_from_cfg(cfg),
              iter_size=int(cfg.REID.ITER_SIZE))}
    ts = ts_lib.place_train_state(mesh, ts)
    sb = ts_lib.shard_batch(mesh, {
        'data': np.asarray(images), 'labels_int32': labels,
        'labels_oh': oh})
    lr = jnp.float32(0.01)
    lsf = jnp.float32(1.0)

    def full(ts_):
        new_ts, logs = step(ts_, sb, lr, lsf, key)
        return new_ts

    def settle(ts_):
        # scalar readback (chained steps serialize on-device; the final
        # readback guarantees completion where block_until_ready may not)
        float(jnp.sum(ts_['params']['conv1_w']))

    for _ in range(3):
        ts = full(ts)
    settle(ts)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ts = full(ts)
    settle(ts)
    t = (time.perf_counter() - t0) / args.iters
    tf_s = 3 * fwd_gf * args.batch / t / 1e3
    print('%-12s %7.2f ms  %6.1f TFLOP/s  (%5.0f imgs/s)'
          % ('full_step', t * 1e3, tf_s, args.batch / t))
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir + '/full_step'):
            for _ in range(3):
                ts = full(ts)
            jax.block_until_ready(ts)

    # 5. uint8-wire step: raw Market-geometry decodes (128x64) shipped as
    # uint8, the whole augmentation chain fused into the step graph
    # (VERDICT item 1 evidence: device-augment rate vs resident-f32 rate)
    u8 = rng.randint(0, 256, (args.batch, 128, 64, 3)).astype(np.uint8)
    sb_u8 = ts_lib.shard_batch(mesh, {
        'data_u8': u8,
        'flipped': (np.arange(args.batch) % 2).astype(bool),
        'labels_int32': labels, 'labels_oh': oh})

    def full_u8(ts_):
        new_ts, _ = step(ts_, sb_u8, lr, lsf, key)
        return new_ts

    for _ in range(3):
        ts = full_u8(ts)
    settle(ts)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        ts = full_u8(ts)
    settle(ts)
    tu = (time.perf_counter() - t0) / args.iters
    print('%-12s %7.2f ms  (%5.0f imgs/s)  = %.0f%% of resident-f32 rate'
          % ('u8aug_step', tu * 1e3, args.batch / tu, 100.0 * t / tu))

    print('model fwd GFLOPs/img: %.2f' % fwd_gf)


if __name__ == '__main__':
    main()
