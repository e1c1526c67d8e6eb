#!/usr/bin/env python
"""Data-loader throughput harness.

Rebuild of /root/reference/detectron/tests/data_loader_benchmark.py for the
prefetch loader: measures host minibatch production (decode + augment +
resize) in imgs/sec across worker counts, with either a synthetic decode
(isolates the augmentation pipeline) or real jpg files.

  python tools/data_loader_benchmark.py [--imdir DIR] [--batches 50]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--imdir', default=None,
                        help='directory of jpgs; synthetic decode if unset')
    parser.add_argument('--batches', type=int, default=50)
    parser.add_argument('--batch-size', type=int, default=64)
    parser.add_argument('--workers', type=int, nargs='+',
                        default=[1, 2, 4, 8])
    args = parser.parse_args()

    from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
    from pps_tpu.data.loader import ReIDLoader

    merge_cfg_from_list([
        'MODEL.NUM_CLASSES', '751',
        'TRAIN.IMS_PER_BATCH', str(args.batch_size),
        'REID.SCALE', '(128, 384)',
        'REID.RANDOM_ERASING_PROB', '0.4',
        'SOLVER.MAX_ITER', '10000',
    ])
    assert_and_infer_cfg(make_immutable=False)

    if args.imdir:
        import glob
        import os
        paths = sorted(glob.glob(os.path.join(args.imdir, '*.jpg')))
        assert paths, 'no jpgs in {}'.format(args.imdir)
        # replicate so one epoch covers the whole measurement
        need = args.batches * args.batch_size + args.batch_size
        paths = (paths * (need // len(paths) + 1))[:need]
        roidb = [{'image': p, 'gt_class': i % 750 + 1, 'flipped': False,
                  'im_name': os.path.basename(p)}
                 for i, p in enumerate(paths)]
        decode_fn = None
    else:
        roidb = [{'image': 'synth://%d' % i, 'gt_class': i % 750 + 1,
                  'flipped': False, 'im_name': '%08d.jpg' % i}
                 for i in range(args.batch_size * args.batches)]

        def decode_fn(path):
            seed = int(path.split('//')[1])
            return np.random.RandomState(seed).randint(
                0, 255, (256, 128, 3)).astype(np.uint8)

    n_images = args.batches * args.batch_size
    for w in args.workers:
        loader = ReIDLoader(roidb, cfg, num_workers=w, decode_fn=decode_fn,
                            prefetch=2 * w)
        t0 = None
        n = 0
        ep = 0
        while n < args.batches:
            for _ in loader.iter_epoch(ep):
                if t0 is None:  # first batch warms the pool
                    t0 = time.perf_counter()
                else:
                    n += 1
                if n >= args.batches:
                    break
            ep += 1
        dt = max(time.perf_counter() - t0, 1e-9)
        print('workers={:d}: {:.0f} imgs/s ({:.1f} ms/batch)'.format(
            w, n * args.batch_size / dt, dt / n * 1e3))


if __name__ == '__main__':
    main()
