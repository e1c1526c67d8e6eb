#!/usr/bin/env python
"""Per-op profile of the flagship train step on the attached TPU.

Captures an xprof trace of N chained train steps (the shipped jitted
step: uint8 device-augment wire -> fwd -> bwd -> SGD) and prints the
top-K HLO ops by self time plus the device FLOP utilization — the
op-level evidence behind BASELINE.md's step-time/MFU numbers (the
reference had only wall-clock timers, SURVEY.md section 5 tracing).

Usage: python tools/trace_top_ops.py [--batch 64] [--steps 10] [--top 15]
       [--eval]   # profile the batched eval/extraction path instead
"""

import argparse
import glob
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def capture_trace(trace_dir, batch, steps, eval_path=False, dtype='bfloat16',
                  int8=False):
    import jax
    import jax.numpy as jnp
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    import __graft_entry__ as g
    from pps_tpu.models.model import build_model
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel import train_step as ts_lib
    from pps_tpu.solver import optimizer as opt_lib

    p = 8
    k = max(1, batch // p)
    if not eval_path and p * k != batch:
        raise SystemExit(
            '--batch {} is not a multiple of {} (the train step runs '
            'P x K triplet batches: P={} identities x K images); pick '
            'e.g. {} or {}'.format(batch, p, p, p * k, p * (k + 1)))
    cfg = g._flagship_cfg(ims_per_batch=batch, p=p, k=k, dtype=dtype)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    w, h = cfg.REID.SCALE
    rng = np.random.RandomState(0)

    if eval_path:
        if int8:
            # int8 PTQ serving graph (models/quantize.py, TPU.INT8_EVAL)
            from pps_tpu.models.quantize import quantize_for_eval
            calib = (rng.randn(64, h, w, 3) * 50).astype(np.float32)
            params = jax.device_put(
                quantize_for_eval(model, params, state, calib))
        fn = jax.jit(lambda pr, st, x: model.extract_features(pr, st, x))
        x = jax.device_put(rng.randn(batch, h, w, 3).astype(np.float32))
        float(jnp.sum(fn(params, state, x)))  # compile
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(steps):
                out = fn(params, state, x)
            float(jnp.sum(out))
        return cfg

    mesh = mesh_lib.build_mesh(cfg)
    meta = opt_lib.make_param_meta(params, cfg)
    opt_state = opt_lib.init_opt_state(params)
    step = ts_lib.make_train_step(model, cfg, mesh, meta=meta)
    labels = np.repeat(np.arange(p), k).astype(np.int32)
    oh = np.zeros((batch, cfg.MODEL.NUM_CLASSES - 1), np.float32)
    oh[np.arange(batch), labels] = 1.0
    host_batch = {
        'data_u8': rng.randint(0, 256, (batch, h, w, 3)).astype(np.uint8),
        'flipped': np.zeros((batch,), bool),
        'labels_int32': labels,
        'labels_oh': oh,
    }
    with mesh:
        ts = ts_lib.place_train_state(
            mesh, {'params': params, 'state': state, 'opt': opt_state})
        db = ts_lib.shard_batch(mesh, host_batch)
        ts, logs = step(ts, db, jnp.float32(0.01), jnp.float32(1.0),
                        jax.random.PRNGKey(0))  # compile
        float(logs['loss'])
        with jax.profiler.trace(trace_dir):
            # chained through the real state dependency (CLAUDE.md
            # timing protocol): each step consumes the previous state
            for i in range(steps):
                ts, logs = step(ts, db, jnp.float32(0.01),
                                jnp.float32(1.0), jax.random.PRNGKey(i))
            float(logs['loss'])
    return cfg


def _rows(tool_json):
    """google-viz {cols, rows} -> list of dicts keyed by col id."""
    tables = tool_json if isinstance(tool_json, list) else [tool_json]
    table = tables[0]
    ids = [c['id'] for c in table['cols']]
    out = []
    for r in table.get('rows', []):
        out.append({i: (c or {}).get('v') for i, c in zip(ids, r['c'])})
    return out


def analyze(trace_dir, top):
    from xprof.convert import raw_to_tool_data as rtd
    xp = sorted(glob.glob(os.path.join(
        trace_dir, 'plugins/profile/*/*.xplane.pb')))
    assert xp, 'no xplane.pb under %s' % trace_dir
    xp = xp[-1:]

    data, _ = rtd.xspace_to_tool_data(list(xp), 'hlo_stats', {})
    rows = _rows(json.loads(data.decode() if isinstance(data, bytes)
                            else data))
    total = sum(r['total_self_time'] for r in rows) or 1.0
    rows.sort(key=lambda r: -r['total_self_time'])
    print('\n%-4s %-10s %-52s %6s %9s %7s' %
          ('#', 'category', 'op (truncated)', 'occ', 'self-us', '%step'))
    acc = 0.0
    for i, r in enumerate(rows[:top]):
        acc += 100.0 * r['total_self_time'] / total
        print('%-4d %-10s %-52s %6d %9.0f %6.1f%%' % (
            i + 1, (r['category'] or '')[:10],
            (r['hlo_op_expression'] or r['hlo_op_name'] or '')[:52],
            r['occurrences'], r['total_self_time'],
            100.0 * r['total_self_time'] / total))
    print('top-%d ops cover %.1f%% of device self time' % (top, acc))

    # category rollup
    cats = {}
    for r in rows:
        c = r['category'] or '?'
        cats[c] = cats.get(c, 0.0) + r['total_self_time']
    print('\ncategory rollup:')
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print('  %-28s %9.0f us  %5.1f%%' % (c, t, 100.0 * t / total))

    data, _ = rtd.xspace_to_tool_data(list(xp), 'op_profile', {})
    prof = json.loads(data.decode() if isinstance(data, bytes) else data)
    m = prof['byProgram']['metrics']
    print('\ndevice FLOP utilization (xprof op_profile, bf16-normalized): '
          '%.1f%%' % (100.0 * m['flops']))
    print('HBM bandwidth utilization: %.1f%%' %
          (100.0 * m['bandwidthUtils'][0]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--top', type=int, default=15)
    ap.add_argument('--eval', action='store_true')
    ap.add_argument('--int8', action='store_true',
                    help='with --eval: trace the int8 PTQ serving graph')
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--trace-dir', default=None)
    args = ap.parse_args()
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix='pps_trace_')
    cfg = capture_trace(trace_dir, args.batch, args.steps,
                        eval_path=args.eval, dtype=args.dtype,
                        int8=args.int8)
    print('trace: %s' % trace_dir)
    analyze(trace_dir, args.top)


if __name__ == '__main__':
    main()
