"""Data layer unit tests: transforms, samplers, schedule, loader, dataset."""

import json
import os

import numpy as np
import pytest

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.data import catalog, transforms
from pps_tpu.data.json_dataset import (ReIDDataset,
                                       combined_roidb_for_training)
from pps_tpu.data.loader import ReIDLoader
from pps_tpu.data.minibatch import get_minibatch
from pps_tpu.data.sampler import EpochSchedule, PermSampler, PKSampler


def _write_coco(tmp_path, n_ids=6, per_id=4, marks=None):
    imdir = os.path.join(str(tmp_path), 'images')
    os.makedirs(imdir, exist_ok=True)
    images, annotations, categories = [], [], []
    aid = 0
    for pid in range(1, n_ids + 1):
        categories.append({'id': pid, 'name': '{:08d}'.format(pid)})
        for j in range(per_id):
            iid = len(images) + 1
            name = '{:08d}_{:04d}_{:08d}.jpg'.format(pid, j % 2 + 1, iid)
            images.append({'id': iid, 'file_name': name,
                           'width': 64, 'height': 128})
            ann = {'id': aid, 'image_id': iid, 'category_id': pid}
            if marks is not None:
                ann['mark'] = marks[(iid - 1) % len(marks)]
            annotations.append(ann)
            aid += 1
    ann_fn = os.path.join(str(tmp_path), 'ann.json')
    with open(ann_fn, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    return imdir, ann_fn


def _fake_decode(path):
    seed = abs(hash(os.path.basename(path))) % (2 ** 31)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(128, 64, 3)).astype(np.uint8)


def test_dataset_parse(tmp_path):
    imdir, ann_fn = _write_coco(tmp_path, n_ids=3, per_id=2)
    catalog.register_dataset('toy_trainval', imdir, ann_fn)
    ds = ReIDDataset('toy_trainval')
    assert len(ds) == 6
    roidb = ds.get_roidb()
    assert roidb[0]['gt_class'] == 1
    assert roidb[-1]['gt_class'] == 3
    assert ds.num_classes == 4  # ids 1..3 + background

    merged, nc = combined_roidb_for_training('toy_trainval',
                                             use_flipped=True)
    assert len(merged) == 12
    assert sum(e['flipped'] for e in merged) == 6
    assert nc == 4


def test_transforms_shapes_and_determinism():
    im = np.random.RandomState(0).randint(
        0, 255, size=(100, 40, 3)).astype(np.uint8)
    r1 = np.random.RandomState(7)
    r2 = np.random.RandomState(7)
    a = transforms.random_crop(im, r1, 1.0, 0.8)
    b = transforms.random_crop(im, r2, 1.0, 0.8)
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] <= 100 and a.shape[1] <= 40

    j = transforms.hsv_jitter(im, np.random.RandomState(1), 1.0, 10, 5, 10)
    assert j.shape == im.shape and j.dtype == np.uint8

    g = transforms.gaussian_blur(im, np.random.RandomState(1), 1.0, 7)
    assert g.shape == im.shape

    means = np.array([[[102.98, 115.95, 122.77]]])
    e = transforms.random_erasing(im.copy(), np.random.RandomState(2), 1.0,
                                  means)
    assert (e != im).any()  # a region was erased
    # erased region holds the means
    diff = np.where((e != im).any(axis=2))
    assert np.allclose(e[diff[0], diff[1], 0], int(means[0, 0, 0]),
                       atol=1.0)


def test_prep_im_for_blob():
    im = np.full((100, 40, 3), 128, np.uint8)
    means = np.array([[[100.0, 110.0, 120.0]]])
    out = transforms.prep_im_for_blob(im, means, (32, 96))
    assert out.shape == (96, 32, 3)
    np.testing.assert_allclose(out[0, 0], [28.0, 18.0, 8.0], atol=1e-4)


def test_minibatch(tmp_path):
    imdir, ann_fn = _write_coco(tmp_path, n_ids=3, per_id=2)
    catalog.register_dataset('toy_mb', imdir, ann_fn)
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '4',
                         'REID.SCALE', '(32, 96)'])
    roidb = ReIDDataset('toy_mb').get_roidb()
    batch = get_minibatch(roidb[:4], cfg, np.random.RandomState(0),
                          decode_fn=_fake_decode)
    assert batch['data'].shape == (4, 96, 32, 3)
    assert batch['labels_int32'].tolist() == [0, 0, 1, 1]
    assert batch['labels_oh'].shape == (4, 3)
    np.testing.assert_array_equal(batch['labels_oh'].argmax(1),
                                  batch['labels_int32'])
    # flipped entry produces the horizontally mirrored image
    e = dict(roidb[0]);  e['flipped'] = True
    b2 = get_minibatch([roidb[0], e], cfg, np.random.RandomState(0),
                       decode_fn=_fake_decode, train=False)
    np.testing.assert_allclose(b2['data'][0], b2['data'][1, :, ::-1],
                               atol=1e-3)


def test_perm_sampler_covers_all():
    s = PermSampler(10, 3, seed=0)
    seen = []
    for _ in range(4):
        seen.extend(s.next_batch())
    assert set(seen[:9]) == set(range(10)) - (set(range(10)) - set(seen[:9]))
    # within the first full permutation pass, no duplicates
    assert len(set(seen[:9])) == 9


def test_pk_sampler_composition():
    labels = [i // 5 for i in range(40)]  # 8 ids x 5 images
    s = PKSampler(labels, p=4, k=3, seed=0)
    for _ in range(6):
        idx = s.next_batch()
        assert len(idx) == 12
        lab = np.array([labels[i] for i in idx])
        uniq, counts = np.unique(lab, return_counts=True)
        assert len(uniq) == 4
        assert (counts == 3).all()


def test_pk_sampler_small_class():
    labels = [0, 0, 1, 1, 1, 1]  # class 0 has fewer than K images
    s = PKSampler(labels, p=2, k=4, seed=0)
    idx = s.next_batch()
    assert len(idx) == 8


def test_epoch_schedule_alternation():
    merge_cfg_from_list([
        'TRAIN.IMS_PER_BATCH', '8', 'NUM_GPUS', '1',
        'REID.TRIPLET_LOSS', 'True', 'REID.TRIPLET_LOSS_CROSS', 'True',
        'REID.TRIPLET_LOSS_START', '2', 'REID.P', '4', 'REID.K', '2',
        'SOLVER.MAX_ITER', '8'])
    # 80 images, 12 identities
    sched = EpochSchedule(cfg, 80, 12)
    assert sched.ipe == 10
    assert sched.ipe_triplet == 3
    # epochs 0..2: perm (scale 0); 3,5,7: pk shortened; 4,6: perm
    for ep in range(8):
        is_tri = ep > 2 and ep % 2 == 1
        assert sched.is_triplet_epoch(ep) == is_tri
        assert sched.epoch_len(ep) == (3 if is_tri else 10)
        mode, scale = sched.describe(ep, 0)
        assert mode == ('pk' if is_tri else 'perm')
        assert scale == (1.0 if is_tri else 0.0)


def test_epoch_schedule_no_cross():
    merge_cfg_from_list([
        'TRAIN.IMS_PER_BATCH', '8', 'NUM_GPUS', '1',
        'REID.TRIPLET_LOSS', 'True', 'REID.TRIPLET_LOSS_CROSS', 'False',
        'REID.P', '4', 'REID.K', '2', 'SOLVER.MAX_ITER', '4'])
    sched = EpochSchedule(cfg, 80, 12)
    mode, scale = sched.describe(0, 0)
    assert mode == 'pk' and scale == 1.0
    assert sched.epoch_len(0) == sched.ipe


def test_loader_epoch(tmp_path):
    imdir, ann_fn = _write_coco(tmp_path, n_ids=6, per_id=4)
    catalog.register_dataset('toy_loader', imdir, ann_fn)
    merge_cfg_from_list([
        'MODEL.NUM_CLASSES', '7', 'TRAIN.IMS_PER_BATCH', '8',
        'REID.SCALE', '(32, 96)', 'REID.TRIPLET_LOSS', 'True',
        'REID.TRIPLET_LOSS_CROSS', 'True', 'REID.TRIPLET_LOSS_START', '0',
        'REID.P', '4', 'REID.K', '2', 'SOLVER.MAX_ITER', '4'])
    roidb, _ = combined_roidb_for_training('toy_loader')
    loader = ReIDLoader(roidb, cfg, num_workers=2, decode_fn=_fake_decode)
    # epoch 1 is a triplet epoch (start=0): P x K composition enforced
    n = 0
    for i, scale, batch in loader.iter_epoch(1):
        assert scale == 1.0
        assert batch['data'].shape == (8, 96, 32, 3)
        n += 1
    assert n == loader.schedule.epoch_len(1)
    # epoch 0: perm mode, scale 0
    for i, scale, batch in loader.iter_epoch(0):
        assert scale == 0.0
        n += 1
    assert n == loader.schedule.epoch_len(1) + loader.schedule.ipe


def test_loader_plan_deterministic(tmp_path):
    imdir, ann_fn = _write_coco(tmp_path, n_ids=6, per_id=4)
    catalog.register_dataset('toy_det', imdir, ann_fn)
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '7',
                         'TRAIN.IMS_PER_BATCH', '8',
                         'REID.SCALE', '(32, 96)'])
    roidb, _ = combined_roidb_for_training('toy_det')
    l1 = ReIDLoader(roidb, cfg, num_workers=1, decode_fn=_fake_decode)
    l2 = ReIDLoader(roidb, cfg, num_workers=3, decode_fn=_fake_decode)
    p1 = l1.plan_epoch(0)
    p2 = l2.plan_epoch(0)
    assert [x[3] for x in p1] == [x[3] for x in p2]


def test_loader_batches_deterministic_across_worker_counts(tmp_path):
    """Sampling AND augmentation must not depend on thread scheduling:
    the same epoch yields bit-identical batches for any worker count."""
    imdir, ann_fn = _write_coco(tmp_path, n_ids=6, per_id=4)
    catalog.register_dataset('toy_det2', imdir, ann_fn)
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '7',
                         'TRAIN.IMS_PER_BATCH', '8',
                         'REID.SCALE', '(32, 96)',
                         'REID.RANDOM_ERASING_PROB', '0.9',
                         'REID.CROP_PROB', '0.5',
                         'REID.CROP_RATIO', '0.8'])
    roidb, _ = combined_roidb_for_training('toy_det2')

    def batches(workers):
        loader = ReIDLoader(roidb, cfg, num_workers=workers,
                            decode_fn=_fake_decode)
        return [b['data'].copy() for _, _, b in loader.iter_epoch(0)]

    b1 = batches(1)
    b3 = batches(3)
    assert len(b1) == len(b3) > 0
    for a, b in zip(b1, b3):
        np.testing.assert_array_equal(a, b)


def test_num_gpus_scales_global_batch(tmp_path):
    """Reference semantics: IMS_PER_BATCH and P are per-device; the global
    batch and P-class count scale with NUM_GPUS (reference
    loader.py:135-142, optimizer.py per-GPU P x K batches)."""
    imdir, ann_fn = _write_coco(tmp_path, n_ids=12, per_id=4)
    catalog.register_dataset('toy_ng', imdir, ann_fn)
    merge_cfg_from_list([
        'MODEL.NUM_CLASSES', '13', 'NUM_GPUS', '2',
        'TRAIN.IMS_PER_BATCH', '8', 'REID.SCALE', '(16, 48)',
        'REID.TRIPLET_LOSS', 'True', 'REID.TRIPLET_LOSS_CROSS', 'False',
        'REID.P', '4', 'REID.K', '2', 'SOLVER.MAX_ITER', '2'])
    roidb, _ = combined_roidb_for_training('toy_ng')
    loader = ReIDLoader(roidb, cfg, num_workers=1, decode_fn=_fake_decode)
    assert loader.schedule.global_batch == 16
    for i, scale, batch in loader.iter_epoch(0):
        assert batch['data'].shape[0] == 16
        lab = batch['labels_int32']
        uniq, counts = np.unique(lab, return_counts=True)
        assert len(uniq) == 8          # P * NUM_GPUS classes
        assert (counts == 2).all()     # K each
        break


def test_loader_qsize_gauge():
    """mb_qsize analog: prepared-ahead depth is gauged at each yield
    (reference training_stats.py:81-83 logged BlobsQueue depth)."""
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '5',
                         'TRAIN.IMS_PER_BATCH', '4',
                         'REID.SCALE', '(16, 48)'])
    roidb = [{'image': 'mem://%d' % i, 'gt_class': i % 4 + 1,
              'flipped': False} for i in range(16)]
    loader = ReIDLoader(roidb, cfg, num_workers=2, prefetch=3,
                        decode_fn=_fake_decode)
    depths = []
    for _i, _scale, _batch in loader.iter_epoch(0):
        depths.append(loader.qsize())
    assert depths, 'epoch yielded no batches'
    assert all(isinstance(d, int) and 0 <= d <= 3 for d in depths)


def test_training_stats_mb_qsize_key():
    from pps_tpu.engine.stats import TrainingStats
    st = TrainingStats(max_iter=10, log_period=1)
    st.IterTic(); st.IterToc()
    st.UpdateIterStats({'loss': np.float32(1.0)}, mb_qsize=3)
    st._drain()
    s = st.GetStats(0, 0.01)
    assert s['mb_qsize'] == 3
    assert s['loss'] == 1.0


def test_loader_knobs_from_cfg():
    """DATA_LOADER.NUM_THREADS / MINIBATCH_QUEUE_SIZE /
    BLOBS_QUEUE_CAPACITY size the loader when no explicit values are
    passed (the reference sized its loader from exactly these keys,
    reference roi_data/loader.py:67-101)."""
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '5',
                         'TRAIN.IMS_PER_BATCH', '4',
                         'REID.SCALE', '(16, 48)',
                         'DATA_LOADER.NUM_THREADS', '3',
                         'DATA_LOADER.MINIBATCH_QUEUE_SIZE', '5',
                         'DATA_LOADER.BLOBS_QUEUE_CAPACITY', '2'])
    roidb = [{'image': 'mem://%d' % i, 'gt_class': i % 4 + 1,
              'flipped': False} for i in range(16)]
    loader = ReIDLoader(roidb, cfg, decode_fn=_fake_decode)
    assert loader._num_workers == 3
    assert loader._prefetch == 5
    assert loader._device_prefetch == 2
    # explicit args still override the cfg
    loader2 = ReIDLoader(roidb, cfg, num_workers=1, prefetch=2,
                         device_prefetch=1, decode_fn=_fake_decode)
    assert loader2._num_workers == 1
    assert loader2._prefetch == 2
    assert loader2._device_prefetch == 1


def test_loader_device_prefetch_ahead():
    """With BLOBS_QUEUE_CAPACITY > 1 the loader transfers prepared
    batches ahead of the consumer via device_put_fn, in plan order."""
    merge_cfg_from_list(['MODEL.NUM_CLASSES', '5',
                         'TRAIN.IMS_PER_BATCH', '4',
                         'REID.SCALE', '(16, 48)'])
    roidb = [{'image': 'mem://%d' % i, 'gt_class': i % 4 + 1,
              'flipped': False} for i in range(16)]
    put_log = []

    def fake_put(batch):
        put_log.append(batch['labels_int32'].tobytes())
        return dict(batch, devved=True)

    loader = ReIDLoader(roidb, cfg, num_workers=2, prefetch=3,
                        device_prefetch=3, decode_fn=_fake_decode,
                        device_put_fn=fake_put)
    got = [b for _i, _s, b in loader.iter_epoch(0)]
    assert len(got) == 4 and all(b.get('devved') for b in got)
    # every batch transferred exactly once, consumed in plan order
    assert len(put_log) == 4
    assert put_log == [b['labels_int32'].tobytes() for b in got]
