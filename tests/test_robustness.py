"""Failure-handling tests: loader worker crash propagation (the reference's
Coordinator stop_on_exception contract, reference utils/coordinator.py:32-73
+ train.py:79-80), NaN-loss abort (train.py:119-120), and multi-query
evaluation."""

import numpy as np
import pytest

from pps_tpu.config import cfg, merge_cfg_from_list
from pps_tpu.data.loader import ReIDLoader
from pps_tpu.evaluation.evaluator import evaluate


def _roidb(n_ids=4, per_id=4):
    roidb = []
    for pid in range(1, n_ids + 1):
        for j in range(per_id):
            roidb.append({
                'image': 'mem://%d_%d' % (pid, j),
                'im_name': '%08d_%04d_%08d.jpg' % (pid, j % 2 + 1,
                                                   len(roidb)),
                'gt_class': pid, 'mark': None, 'flipped': False})
    return roidb


def test_loader_worker_crash_propagates():
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '5',
                         'TRAIN.IMS_PER_BATCH', '4',
                         'REID.SCALE', '(16, 48)'])

    def bad_decode(path):
        raise IOError('corrupt image: %s' % path)

    loader = ReIDLoader(_roidb(), cfg, num_workers=2, decode_fn=bad_decode)
    with pytest.raises(RuntimeError, match='data loader worker failed'):
        for _ in loader.iter_epoch(0):
            pass


def test_nan_loss_aborts(tmp_path):
    """FloatingPointError from train_model when the loss goes NaN."""
    import jax
    from pps_tpu.engine import train as train_lib

    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1', 'TRAIN.FREEZE_AT', '0',
        'TRAIN.IMS_PER_BATCH', '8', 'TRAIN.WEIGHTS', '',
        'SOLVER.MAX_ITER', '1',
        'SOLVER.BASE_LR', '1e12',  # diverge on purpose
        'REID.SCALE', '(16, 48)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8',
    ])

    def decode(path):
        i = abs(hash(path)) % 100
        return (np.random.RandomState(i).rand(48, 16, 3) * 255).astype(
            np.uint8)

    roidb = _roidb(n_ids=4, per_id=8)
    with pytest.raises(FloatingPointError):
        train_lib.train_model(cfg, output_dir=str(tmp_path),
                              roidb=roidb, decode_fn=decode,
                              num_workers=1, log_period=1)


def test_multi_query_pooling():
    """mark=2 entries pool per (id, cam) and score as Multi Query
    (reference reid_dataset_evaluator.py:131-159)."""
    rng = np.random.RandomState(0)
    n_ids, d = 6, 16
    centers = rng.randn(n_ids, d) * 3
    ids, cams, marks, feats = [], [], [], []
    for pid in range(n_ids):
        for j in range(8):
            ids.append(pid)
            cams.append(j % 2)
            marks.append(0 if j == 0 else (2 if j < 3 else 1))
            feats.append(centers[pid] + rng.randn(d) * 0.3)
    feats = np.stack(feats).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    res = evaluate(feats, np.array(ids), np.array(cams), np.array(marks))
    assert 'multi' in res
    assert res['multi']['mAP'] > 0.5
    assert 0.0 <= res['multi']['cmc1'] <= 1.0


def test_nan_check_ignores_undrained_stats():
    """A resumed run reaches the NaN check before the first log drain;
    the initial sentinel must not abort training (regression: real-TPU
    resume aborted with a false 'Loss is NaN')."""
    from pps_tpu.engine.stats import TrainingStats
    s = TrainingStats(1000, log_period=40)
    assert not s.loss_is_nan()          # nothing drained yet
    import jax.numpy as jnp
    s.UpdateIterStats({'loss': jnp.float32(1.5)})
    s.LogIterStats(40, 0.01)            # drains
    assert not s.loss_is_nan()
    s.UpdateIterStats({'loss': jnp.float32(float('nan'))})
    s.LogIterStats(80, 0.01)
    assert s.loss_is_nan()
