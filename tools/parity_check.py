#!/usr/bin/env python
"""One-command real-data parity check: reference numerics vs this framework.

Given a test dataset and either a features.pkl (ours or one produced by
the reference's test_net, same {'all_feats': ...} container —
reference core/test_engine.py:356-368) or a checkpoint to extract
features from, prints side-by-side mAP/CMC from

  * the reference evaluator's OWN code (AST-exec'd oracle with the
    pinned-0.18.1 AP, evaluation/reference_oracle.py),
  * our numpy path (evaluation/metrics.py),
  * our device path (evaluation/device_eval.py + device re-ranking),

and applies the EXPECTED_RESULTS-style tolerance (cfg
EXPECTED_RESULTS_ATOL/RTOL, reference task_evaluation.py:200-245) to
ours-vs-oracle.  Exit code 1 on any out-of-tolerance metric, so the
moment real Market-1501/Duke/CUHK03 data + reference features exist,
demonstrated parity is:

  python tools/parity_check.py --dataset market1501_test \\
      --features /path/to/reference/features.pkl

Usage with a checkpoint instead (extracts features first):
  python tools/parity_check.py --dataset market1501_test \\
      --weights model_final.pkl --cfg configs/...yaml
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--dataset', required=True,
                   help='catalog name of the test set (marks/ids/cams)')
    p.add_argument('--features', default=None,
                   help='features.pkl (ours or reference-produced)')
    p.add_argument('--weights', default=None,
                   help='checkpoint to extract features from instead')
    p.add_argument('--cfg', dest='cfg_file', default=None)
    p.add_argument('--no-rerank', action='store_true')
    p.add_argument('--pool', default='average', choices=['average', 'max'])
    p.add_argument('opts', nargs=argparse.REMAINDER)
    return p.parse_args()


def _load_features(path):
    from pps_tpu.utils.io import load_object
    payload = load_object(path)
    if isinstance(payload, dict) and 'all_feats' in payload:
        return np.asarray(payload['all_feats'])
    return np.asarray(payload)


def main():
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()  # --weights path compiles the eval graph
    args = parse_args()
    from pps_tpu.config import (cfg, merge_cfg_from_file,
                                merge_cfg_from_list, assert_and_infer_cfg)
    from pps_tpu.data.json_dataset import roidb_for_test
    from pps_tpu.evaluation import evaluator as eval_lib
    from pps_tpu.evaluation import reference_oracle as oracle_lib
    from pps_tpu.utils.logging import setup_logging
    setup_logging(__name__)

    if args.cfg_file:
        merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg()

    roidb = roidb_for_test(args.dataset)
    ids = np.array([eval_lib.parse_im_name(e['im_name'], 'id')
                    for e in roidb])
    cams = np.array([eval_lib.parse_im_name(e['im_name'], 'cam')
                     for e in roidb])
    marks = np.array([e['mark'] for e in roidb])

    if args.features:
        feats = _load_features(args.features)
    else:
        assert args.weights, 'need --features or --weights'
        from pps_tpu.engine.test import (build_model,
                                         extract_dataset_features)
        from pps_tpu.engine import checkpoint as ckpt_lib
        import jax
        model = build_model(cfg)
        params, state = model.init(jax.random.PRNGKey(cfg.RNG_SEED))
        params, state, _ = ckpt_lib.load_checkpoint(
            args.weights, model, params, state)
        feats = extract_dataset_features(cfg, model, params, state, roidb)
    assert feats.shape[0] == len(roidb), (
        'feature count {} != dataset size {}'.format(feats.shape[0],
                                                     len(roidb)))
    to_re_rank = not args.no_rerank

    columns = {}
    if oracle_lib.available():
        oracle = oracle_lib.load_oracle(pinned_ap=True)
        columns['reference-oracle'] = oracle_lib.evaluate_with_oracle(
            oracle, feats, ids, cams, marks, to_re_rank=to_re_rank,
            pool_type=args.pool)
    else:
        print('NOTE: reference tree not found at %s; oracle column '
              'skipped' % oracle_lib.REFERENCE_EVALUATOR)
    columns['ours-numpy'] = eval_lib.evaluate(
        feats, ids, cams, marks, to_re_rank=to_re_rank,
        pool_type=args.pool)
    columns['ours-device'] = eval_lib.evaluate(
        feats, ids, cams, marks, to_re_rank=to_re_rank,
        pool_type=args.pool, device_single_query=True, device_rerank=True)

    atol = cfg.EXPECTED_RESULTS_ATOL
    rtol = cfg.EXPECTED_RESULTS_RTOL
    names = list(columns)
    blocks = [b for b in ('single', 'multi', 'single_rerank',
                          'multi_rerank') if b in columns[names[0]]]
    header = '{:<26}'.format('metric') + ''.join(
        '{:>20}'.format(n) for n in names) + '{:>10}'.format('verdict')
    print('\n' + '=' * len(header))
    print(header)
    print('=' * len(header))
    failures = 0
    for block in blocks:
        for metric in ('mAP', 'cmc1', 'cmc5', 'cmc10'):
            vals = [columns[n][block][metric] for n in names]
            ref_v, our_v = vals[0], vals[-1]
            ok = abs(our_v - ref_v) <= atol + rtol * abs(ref_v)
            failures += (not ok)
            print('{:<26}'.format(block + '/' + metric) + ''.join(
                '{:>20.6f}'.format(v) for v in vals) +
                '{:>10}'.format('OK' if ok else 'FAIL'))
    print('=' * len(header))
    print('tolerance: atol={} rtol={} (EXPECTED_RESULTS contract); '
          'compared {} vs {}'.format(atol, rtol, names[-1], names[0]))
    if failures:
        print('PARITY FAIL: %d metric(s) out of tolerance' % failures)
        sys.exit(1)
    print('PARITY OK')


if __name__ == '__main__':
    main()
