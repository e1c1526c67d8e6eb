#!/usr/bin/env python
"""Extract features + evaluate a trained re-ID model.

Rebuild of /root/reference/tools/test_net.py:93-117.  The reference's
``--range``/subprocess dataset sharding disappears: extraction is batched
and sharded over the device mesh in one process.  ``--wait`` keeps the
poll-for-weights contract used by the epoch-sweep scripts.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import logging
import os
import pprint
import sys
import time


def parse_args():
    parser = argparse.ArgumentParser(description='Test a re-ID network')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--wait', action='store_true',
                        help='Wait for the weights file to appear')
    parser.add_argument('--multi-gpu-testing', dest='multi_gpu_testing',
                        action='store_true',
                        help='Accepted for CLI compat; mesh eval is always '
                             'multi-device')
    parser.add_argument('--vis', action='store_true')
    parser.add_argument('opts', nargs=argparse.REMAINDER)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    from pps_tpu.utils.env import apply_platform_env
    apply_platform_env()
    from pps_tpu.config import (cfg, merge_cfg_from_file,
                                merge_cfg_from_list, assert_and_infer_cfg)
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
    if args.vis:
        cfg.REID.VIS = True
    # freeze after the merge (reference test_net.py:101 + config.py:1165)
    assert_and_infer_cfg()
    logger.info('Testing with config:\n%s', pprint.pformat(cfg))

    weights = cfg.TEST.WEIGHTS
    assert weights, 'TEST.WEIGHTS must be set'
    while args.wait and not os.path.exists(weights):
        logger.info('Waiting for \'%s\' to exist...', weights)
        time.sleep(10)

    # eval artifacts land in <OUTPUT_DIR>/test/<dataset>/ per dataset
    # (the get_output_dir convention, reference test_engine.py:108)
    results = run_inference(cfg, weights_file=weights)
    check_expected_results(cfg, results)


if __name__ == '__main__':
    main()
