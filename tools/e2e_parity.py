#!/usr/bin/env python
"""End-to-end accuracy-parity chain: our full pipeline vs the reference
semantics, composed, on synthetic data.

The strongest in-environment parity statement available without the real
Market-1501/Duke/CUHK03 data (tools/parity_check.py covers that moment):

  1. write a synthetic identity dataset to disk (real image files),
  2. train the flagship model config through the REAL driver
     (engine/train.train_model: loader, P*K sampler, augmentation,
     optimizer, snapshots),
  3. extract the test set through BOTH
       a. our pipeline (engine/test.test_net: preprocessing + jit'd
          mesh-sharded extraction), and
       b. the torch reference-mirror replay of the reference's inference
          graph + blob prep (evaluation/torch_mirror.py, built from the
          reference's graph structure and fed the reference-format pkl
          checkpoint),
  4. score BOTH feature sets through the reference evaluator's OWN
     AST-exec'd `evaluate` flow (evaluation/reference_oracle.py,
     reference reid_dataset_evaluator.py:29-209),
  5. assert every mAP/CMC metric agrees within the EXPECTED_RESULTS
     tolerance (cfg.EXPECTED_RESULTS_ATOL/RTOL, reference
     task_evaluation.py:200-245).  Exit 1 on any miss.

This composes the per-stage parity proofs (tests/test_torch_parity.py
operator parity, tests/test_reference_oracle.py evaluator parity) into a
single end-to-end metric-parity demonstration against reference
semantics.

Usage:
    python tools/e2e_parity.py                 # flagship geometry
    python tools/e2e_parity.py --small         # small geometry smoke
"""

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

N_IDS = 8


def write_synth_dataset(root, split, n_ids=N_IDS, per_id=4,
                        with_marks=False, hw=(128, 64), noise=8.0,
                        spread=None):
    """A COCO-format identity dataset of REAL image files (lossless png:
    both extraction paths decode identical pixels from disk).  Image
    content is an identity-specific band pattern + per-image noise so the
    tiny net has signal to learn.  Names follow the reference convention
    parsed by evaluator.parse_im_name (id chars [0:8], cam [9:13])."""
    import cv2
    imdir = os.path.join(root, 'images_' + split)
    os.makedirs(imdir, exist_ok=True)
    h, w = hw
    images, annotations, categories = [], [], []
    for pid in range(1, n_ids + 1):
        categories.append({'id': pid, 'name': '{:08d}'.format(pid)})
        if spread is None:
            pattern = np.random.RandomState(pid).randint(
                0, 255, size=(8, 4, 3)).astype(np.float32)
        else:
            # identities packed close together: a hard retrieval problem
            pattern = 128.0 + spread * np.random.RandomState(
                pid).randn(8, 4, 3).astype(np.float32)
        band = np.kron(pattern, np.ones((h // 8, w // 4, 1), np.float32))
        for j in range(per_id):
            iid = len(images) + 1
            cam = j % 2 + 1
            name = '{:08d}_{:04d}_{:08d}.png'.format(pid, cam, iid)
            im = band + np.random.RandomState(
                100000 * (0 if with_marks else 1) + iid).randn(
                    h, w, 3) * noise
            cv2.imwrite(os.path.join(imdir, name),
                        np.clip(im, 0, 255).astype(np.uint8))
            images.append({'id': iid, 'file_name': name,
                           'width': w, 'height': h})
            ann = {'id': iid, 'image_id': iid, 'category_id': pid}
            if with_marks:
                # per id: 1 query, 1 multi-query extra, rest gallery
                ann['mark'] = 0 if j == 0 else (2 if j == 1 else 1)
            annotations.append(ann)
    ann_fn = os.path.join(root, split + '.json')
    with open(ann_fn, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    return imdir, ann_fn


def parity_cfg(root, flagship=True, max_epochs=2):
    """The flagship reference yaml, shrunk to synthetic-data scale with
    its GEOMETRY intact (R-50, SCALE (128,384), 5 strips, BPM_DIM 128).
    --small shrinks geometry too (fast smoke)."""
    from pps_tpu.config import (cfg, merge_cfg_from_file,
                                merge_cfg_from_list, assert_and_infer_cfg)
    from pps_tpu.data import catalog

    imdir, ann = write_synth_dataset(root, 'trainval', with_marks=False)
    catalog.register_dataset('e2e_parity_trainval', imdir, ann)
    # tightly-packed identity patterns + heavy noise keep the test-split
    # retrieval problem non-trivial (metrics strictly inside (0, 1)) so
    # the two-sided comparison exercises real rank order, not a
    # saturated scoreboard
    imdir, ann = write_synth_dataset(root, 'test', with_marks=True,
                                     noise=100.0, spread=10.0)
    catalog.register_dataset('e2e_parity_test', imdir, ann)

    merge_cfg_from_file(os.path.join(
        '/root/reference/configs/market1501/pps_crm_triplet_R-50_1x.yaml'))
    overrides = [
        'MODEL.NUM_CLASSES', str(N_IDS + 1),
        'TRAIN.WEIGHTS', '',
        'TRAIN.DATASETS', "('e2e_parity_trainval',)",
        'TRAIN.IMS_PER_BATCH', '8',
        'TRAIN.SNAPSHOT_ITERS', '1',
        'TEST.DATASETS', "('e2e_parity_test',)",
        'TEST.IMS_PER_BATCH', '8',
        'SOLVER.MAX_ITER', str(max_epochs),
        'SOLVER.STEPS', '[0]',
        'SOLVER.BASE_LR', '0.002',
        'REID.P', '4',
        'REID.K', '2',
        'REID.TRIPLET_LOSS_START', '0',
        'OUTPUT_DIR', os.path.join(root, 'out'),
    ]
    if not flagship:
        overrides += ['REID.SCALE', '(32, 96)',
                      'REID.BPM_STRIP_NUM', '3',
                      'REID.BPM_DIM', '16']
    merge_cfg_from_list(overrides)
    assert_and_infer_cfg(make_immutable=False)
    return cfg


def run_chain(cfg, output_dir):
    """Steps 2-4: train -> two-sided extraction -> two-sided oracle
    scoring.  Returns (results_ours, results_torch, feats_ours,
    feats_torch, roidb)."""
    from pps_tpu.engine.train import train_model
    from pps_tpu.engine import test as test_engine
    from pps_tpu.evaluation.evaluator import parse_im_name
    from pps_tpu.evaluation.reference_oracle import (load_oracle,
                                                     evaluate_with_oracle)
    from pps_tpu.evaluation.torch_mirror import torch_extract_features
    from pps_tpu.utils.io import load_object

    ckpts = train_model(cfg, output_dir=output_dir)
    dataset = cfg.TEST.DATASETS[0]

    feats_ours, roidb = test_engine.test_net(
        cfg, ckpts['final'], dataset, output_dir=output_dir)

    blobs = {k: np.asarray(v)
             for k, v in load_object(ckpts['final'])['blobs'].items()}
    feats_torch = torch_extract_features(cfg, blobs, roidb)

    ids = np.array([parse_im_name(e['im_name'], 'id') for e in roidb])
    cams = np.array([parse_im_name(e['im_name'], 'cam') for e in roidb])
    marks = np.array([e['mark'] for e in roidb])

    oracle = load_oracle(pinned_ap=True)
    res_ours = evaluate_with_oracle(oracle, feats_ours, ids, cams, marks,
                                    to_re_rank=True)
    res_torch = evaluate_with_oracle(oracle, feats_torch, ids, cams, marks,
                                     to_re_rank=True)
    return res_ours, res_torch, feats_ours, feats_torch, roidb


def compare(cfg, res_ours, res_torch):
    """EXPECTED_RESULTS tolerance (task_evaluation.py:200-245 semantics:
    |actual - expected| <= atol + rtol*|expected|) applied metric-by-
    metric, torch-mirror side as 'expected'.  Returns failure messages."""
    atol = cfg.EXPECTED_RESULTS_ATOL
    rtol = cfg.EXPECTED_RESULTS_RTOL
    failures = []
    for block in sorted(res_torch):
        for metric in ('mAP', 'cmc1', 'cmc5', 'cmc10'):
            expected = res_torch[block][metric]
            actual = res_ours[block][metric]
            err = abs(actual - expected)
            tol = atol + rtol * abs(expected)
            line = ('%-14s %-6s ours=%.4f  torch-ref=%.4f  err=%.5f '
                    'tol=%.4f' % (block, metric, actual, expected, err,
                                  tol))
            print(('PASS  ' if err <= tol else 'FAIL  ') + line)
            if err > tol:
                failures.append(line)
    return failures


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument('--small', action='store_true',
                        help='small geometry (fast smoke) instead of '
                             'flagship geometry')
    parser.add_argument('--root', default='/tmp/e2e_parity',
                        help='scratch dir for the synthetic dataset + run')
    parser.add_argument('--epochs', type=int, default=2)
    args = parser.parse_args()

    from pps_tpu.utils.env import apply_platform_env
    apply_platform_env()
    logging.basicConfig(level=logging.INFO)

    os.makedirs(args.root, exist_ok=True)
    cfg = parity_cfg(args.root, flagship=not args.small,
                     max_epochs=args.epochs)
    res_ours, res_torch, f_ours, f_torch, _ = run_chain(
        cfg, os.path.join(args.root, 'out'))

    cos = np.sum(f_ours * f_torch, axis=1)  # both L2-normalized
    print('feature agreement: min cosine %.6f  max |delta| %.2e'
          % (cos.min(), np.abs(f_ours - f_torch).max()))
    failures = compare(cfg, res_ours, res_torch)
    if failures:
        print('\nE2E PARITY: FAIL (%d metrics out of tolerance)'
              % len(failures))
        return 1
    print('\nE2E PARITY: PASS — trained checkpoint, two independent '
          'extraction stacks, reference-oracle scoring, all metrics '
          'within EXPECTED_RESULTS tolerance')
    return 0


if __name__ == '__main__':
    sys.exit(main())
