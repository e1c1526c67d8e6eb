#!/usr/bin/env python
"""Train a re-ID network and test snapshots.

CLI-compatible rebuild of /root/reference/tools/train_net.py:87-128:
  python tools/train_net.py --cfg <yaml> [--skip-test] [KEY VALUE ...]
Trains, then tests the final model and every snapshot epoch in reverse.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import logging
import pprint
import sys

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description='Train a re-ID network')
    parser.add_argument('--cfg', dest='cfg_file', default=None,
                        help='Config yaml')
    parser.add_argument('--skip-test', action='store_true',
                        help='Do not test the final model')
    parser.add_argument('--multi-gpu-testing', dest='multi_gpu_testing',
                        action='store_true',
                        help='Accepted for CLI compat; the mesh eval is '
                             'always multi-device')
    parser.add_argument('opts', nargs=argparse.REMAINDER,
                        help='See pps_tpu.config for all options')
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    from pps_tpu.utils.env import apply_platform_env
    apply_platform_env()
    from pps_tpu.config import (cfg, merge_cfg_from_file,
                                merge_cfg_from_list, assert_and_infer_cfg)
    from pps_tpu.engine.train import Preempted, train_model
    from pps_tpu.engine.test import run_inference
    from pps_tpu.evaluation.expected_results import check_expected_results
    from pps_tpu.utils.logging import setup_logging

    logger = setup_logging(__name__)
    args = parse_args()
    logger.info('Called with args: %s', args)
    if args.cfg_file is not None:
        merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    # freeze after the merge (reference train_net.py:100 + config.py:1165):
    # a stray cfg assignment anywhere on the driver path now raises
    assert_and_infer_cfg()
    logger.info('Training with config:\n%s', pprint.pformat(cfg))
    np.random.seed(cfg.RNG_SEED)

    # checkpoints land in <OUTPUT_DIR>/train/<dataset>/ and eval artifacts
    # in <OUTPUT_DIR>/test/<dataset>/ (the get_output_dir convention,
    # reference utils/train.py:144, test_engine.py:108)
    try:
        checkpoints = train_model(cfg)
    except Preempted as p:
        # SIGTERM (TPU-VM maintenance / spot reclaim): the mid-epoch
        # resume checkpoint is already durably written; rerunning the
        # same command continues from the exact step.  75 = EX_TEMPFAIL
        # tells schedulers this is a retry, not a failure or completion.
        logger.info('%s — rerun the same command to resume', p)
        sys.exit(75)

    if not args.skip_test:
        results = run_inference(cfg, weights_file=checkpoints['final'])
        check_expected_results(cfg, results)
        print('reprint snapshot name for the result: ', checkpoints['final'])
        # explicit unfreeze around the documented post-train mutations
        # (reference train_net.py:119-123)
        cfg.immutable(False)
        cfg.TEST.BBOX_AUG.ENABLED = False
        cfg.REID.VIS = False
        cfg.immutable(True)
        for snapshot in sorted((k for k in checkpoints if k != 'final'),
                               reverse=True):
            run_inference(cfg, weights_file=checkpoints[snapshot])
            print('reprint snapshot name for the result: ', snapshot,
                  checkpoints[snapshot])


if __name__ == '__main__':
    main()
