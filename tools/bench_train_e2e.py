"""End-to-end training throughput: loader -> wire -> fused-augment step.

Generates a Market-like synthetic identity dataset (n_ids x per_id raw
64x128 JPEGs + COCO json), registers it, and runs the real `train_model`
driver under the flagship config for a few epochs.  The per-step wall
clock lands in the `json_stats:` lines (the `time` field); pipe stdout
to a file and take the median of the steady epochs.

This measures the VERDICT-item-1 claim end-to-end: with
TPU.DEVICE_AUGMENT the host ships raw uint8 decodes (~9.4 MB/step at
batch 64) and the augmentation chain runs inside the step; compare
`TPU.DEVICE_AUGMENT False` (host augment chain + f32/bf16 wire).
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_dataset(root, n_ids=751, per_id=12, hw=(128, 64), seed=0,
                 mixed=False):
    import cv2
    import json
    imdir = os.path.join(root, 'images')
    os.makedirs(imdir, exist_ok=True)
    rng = np.random.RandomState(seed)
    # mixed: Duke/CUHK03-style non-uniform decode sizes -> exercises the
    # reflect-padded bucket + valid_hw wire end-to-end
    size_table = [hw, (hw[0] - 24, hw[1] - 12), (hw[0] - 48, hw[1] - 20)]
    images, anns = [], []
    iid = 0
    for pid in range(1, n_ids + 1):
        for j in range(per_id):
            iid += 1
            name = '{:08d}_{:04d}_{:08d}.jpg'.format(pid, j % 6 + 1, iid)
            shw = size_table[iid % 3] if mixed else hw
            im = rng.randint(0, 256, shw + (3,), dtype=np.uint8)
            cv2.imwrite(os.path.join(imdir, name), im)
            images.append({'id': iid, 'file_name': name,
                           'height': shw[0], 'width': shw[1]})
            anns.append({'id': iid, 'image_id': iid, 'category_id': pid,
                         'mark': 1})
    ann_fn = os.path.join(root, 'trainval.json')
    with open(ann_fn, 'w') as f:
        json.dump({'images': images, 'annotations': anns,
                   'categories': [{'id': p, 'name': str(p)}
                                  for p in range(1, n_ids + 1)]}, f)
    return imdir, ann_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-ids', type=int, default=751)
    ap.add_argument('--per-id', type=int, default=12)
    ap.add_argument('--epochs', type=int, default=2)
    ap.add_argument('--device-augment', default='True')
    ap.add_argument('--mixed-sizes', action='store_true',
                    help='non-uniform decode sizes (padded-bucket wire)')
    ap.add_argument('--workers', type=int, default=2)
    ap.add_argument('--data-dir', default=None)
    args = ap.parse_args()

    import jax
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()

    root = args.data_dir or tempfile.mkdtemp(prefix='pps_e2e_')
    if not os.path.exists(os.path.join(root, 'trainval.json')):
        print('writing synthetic dataset to %s ...' % root, flush=True)
        make_dataset(root, args.n_ids, args.per_id,
                     mixed=args.mixed_sizes)
    from pps_tpu.data.catalog import register_dataset
    register_dataset('synth_e2e_trainval', os.path.join(root, 'images'),
                     os.path.join(root, 'trainval.json'))

    import __graft_entry__ as g
    cfg = g._flagship_cfg(num_classes=args.n_ids + 1)
    cfg.immutable(False)  # _flagship_cfg froze it; amend the run knobs
    from pps_tpu.config import merge_cfg_from_list
    merge_cfg_from_list([
        'TRAIN.DATASETS', "('synth_e2e_trainval',)",
        'SOLVER.MAX_ITER', str(args.epochs),
        'TPU.DEVICE_AUGMENT', args.device_augment,
        # fresh run dir per invocation: reusing one would hit the
        # model_final.pkl training-complete marker (auto-resume contract)
        # and silently benchmark nothing
        'OUTPUT_DIR', os.path.join(root, 'out_%d' % os.getpid()),
    ])
    from pps_tpu.engine.train import train_model
    train_model(cfg, num_workers=args.workers, log_period=20)


if __name__ == '__main__':
    main()
