"""Tests for CLI tools: dataset converter, expected-results harness,
log parsing."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

from pps_tpu.config import cfg, merge_cfg_from_list
from pps_tpu.data import catalog
from pps_tpu.data.json_dataset import ReIDDataset
from pps_tpu.evaluation.expected_results import (check_expected_results,
                                                 ExpectedResultsError)


def _make_images(imdir, names):
    import cv2
    os.makedirs(imdir, exist_ok=True)
    for n in names:
        im = np.random.RandomState(hash(n) % 1000).randint(
            0, 255, (128, 64, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(imdir, n), im)


def test_from_partitions(tmp_path):
    import reid_to_coco
    save_dir = str(tmp_path)
    imdir = os.path.join(save_dir, 'images')
    trainval = ['{:08d}_{:04d}_{:08d}.jpg'.format(pid, 1, i)
                for i, pid in enumerate([3, 3, 7, 7, 9, 9])]
    test = ['{:08d}_{:04d}_{:08d}.jpg'.format(pid, 2, 100 + i)
            for i, pid in enumerate([11, 11, 12, 12])]
    _make_images(imdir, trainval + test)
    partitions = {
        'trainval_im_names': trainval,
        'trainval_ids2labels': {3: 0, 7: 1, 9: 2},
        'test_im_names': test,
        'test_marks': [0, 1, 0, 1],
    }
    with open(os.path.join(save_dir, 'partitions.pkl'), 'wb') as f:
        pickle.dump(partitions, f)
    reid_to_coco.from_partitions(save_dir)

    catalog.register_dataset('conv_trainval', imdir,
                             os.path.join(save_dir, 'trainval.json'))
    catalog.register_dataset('conv_test', imdir,
                             os.path.join(save_dir, 'test.json'))
    ds = ReIDDataset('conv_trainval')
    assert len(ds) == 6
    assert ds.num_classes == 4  # 3 ids + bg
    roidb = ds.get_roidb()
    # 0-based category ids map to contiguous 1-based classes
    assert sorted({e['gt_class'] for e in roidb}) == [1, 2, 3]
    assert all(e['mark'] is None for e in roidb)

    ds_t = ReIDDataset('conv_test')
    marks = [e['mark'] for e in ds_t.get_roidb()]
    assert marks == [0, 1, 0, 1]


def test_from_raw_market_layout(tmp_path):
    import reid_to_coco
    raw = tmp_path / 'raw'
    names_train = ['0001_c1s1_000151_01.jpg', '0001_c2s1_000176_02.jpg',
                   '0007_c1s6_028546_01.jpg']
    names_test = ['0013_c5s3_000151_01.jpg', '-1_c1s1_000401_03.jpg']
    names_query = ['0013_c5s3_000100_00.jpg']
    _make_images(str(raw / 'bounding_box_train'), names_train)
    _make_images(str(raw / 'bounding_box_test'), names_test)
    _make_images(str(raw / 'query'), names_query)
    save = str(tmp_path / 'out')
    reid_to_coco.from_raw(str(raw), save, 'market1501')

    with open(os.path.join(save, 'trainval.json')) as f:
        tr = json.load(f)
    assert len(tr['images']) == 3
    assert len(tr['categories']) == 2  # ids 1 and 7
    with open(os.path.join(save, 'test.json')) as f:
        te = json.load(f)
    # junk (-1) dropped; 1 query + 1 gallery
    assert len(te['images']) == 2
    marks = [a['mark'] for a in te['annotations']]
    assert marks == [0, 1]
    # renamed images exist on disk
    for im in te['images']:
        assert os.path.exists(os.path.join(save, 'images', im['file_name']))


def test_expected_results():
    merge_cfg_from_list(['EXPECTED_RESULTS',
                         "[['ds', 'single', 'mAP', 0.5]]"])
    ok = check_expected_results(
        cfg, {'ds': {'single': {'mAP': 0.52}}})
    assert ok == []
    fails = check_expected_results(
        cfg, {'ds': {'single': {'mAP': 0.2}}})
    assert len(fails) == 1
    with pytest.raises(ExpectedResultsError):
        check_expected_results(cfg, {'ds': {'single': {'mAP': 0.2}}},
                               raise_on_fail=True)
    # mean/std form
    cfg.EXPECTED_RESULTS = [['ds', 'single', 'mAP', [0.5, 0.01]]]
    assert check_expected_results(
        cfg, {'ds': {'single': {'mAP': 0.52}}}) == []
    assert len(check_expected_results(
        cfg, {'ds': {'single': {'mAP': 0.6}}})) == 1


def test_loss_vs_map_parsing(tmp_path):
    import loss_vs_map
    log = tmp_path / 'train.log'
    log.write_text('\n'.join([
        'json_stats: {"iter": 0, "loss": "3.5", "lr": "0.01"}',
        'saved model_epoch1.pkl',
        'json_stats: {"iter": 20, "loss": "2.5", "lr": "0.01"}',
        'Single Query:  [mAP: 81.25%], [cmc1: 92.00%]',
        'Single Query:  [mAP: 70.00%], [cmc1: 85.00%]',
    ]))
    losses, iters, snaps = loss_vs_map.get_loss(str(log))
    assert losses == [3.5, 2.5]
    assert snaps == [1.0]
    final, series = loss_vs_map.get_map(str(log))
    assert final == 81.25
    assert series == [70.0]


def test_from_cuhk03_mat(tmp_path):
    """Synthetic cuhk-03.mat (v7.3-style object refs, transposed arrays)
    -> labeled/detected image dirs + jsons."""
    import h5py
    import reid_to_coco

    mat_path = str(tmp_path / 'cuhk-03.mat')
    rng = np.random.RandomState(0)
    n_ids_per_pair, n_pairs = 3, 2
    with h5py.File(mat_path, 'w') as f:
        def make_cell(tag):
            pair_refs = []
            for p in range(n_pairs):
                # cell matrix [n_ids, 10] of refs to images, stored
                # transposed like matlab v7.3 ([10, n_ids] on disk)
                img_refs = np.empty((10, n_ids_per_pair), dtype=h5py.ref_dtype)
                for i in range(n_ids_per_pair):
                    for j in range(10):
                        if j in (4, 9):  # simulate missing tail images
                            im = np.zeros((2, 0), np.uint8)
                        else:
                            im = rng.randint(
                                0, 255, (40, 20, 3)).astype(np.uint8)
                        ds = f.create_dataset(
                            '{}_p{}_i{}_j{}'.format(tag, p, i, j),
                            data=im.T)
                        img_refs[j, i] = ds.ref
                cell = f.create_dataset('{}_pair{}'.format(tag, p),
                                        data=img_refs)
                pair_refs.append(cell.ref)
            # matlab 5x1 cell stored transposed -> [1, n_pairs] on disk
            arr = np.empty((1, len(pair_refs)), dtype=h5py.ref_dtype)
            for i, r in enumerate(pair_refs):
                arr[0, i] = r
            f.create_dataset(tag, data=arr)
        make_cell('labeled')
        make_cell('detected')

    # split pkl naming images of ids 0..5 (cam 0 file 0 / cam 1 file 0)
    def name(pid, cam, i):
        return '{:08d}_{:04d}_{:08d}.jpg'.format(pid, cam, i)
    split = {}
    for t in ('labeled', 'detected'):
        split[t] = {
            'train_im_names': [name(p, 0, 0) for p in range(4)],
            'query_im_names': [name(4, 0, 0), name(5, 0, 0)],
            'gallery_im_names': [name(4, 1, 0), name(5, 1, 0)],
        }
    split_pkl = str(tmp_path / 'split.pkl')
    with open(split_pkl, 'wb') as f:
        pickle.dump(split, f)

    save = str(tmp_path / 'out')
    reid_to_coco.from_cuhk03_mat(mat_path, split_pkl, save)
    for t in ('labeled', 'detected'):
        with open(os.path.join(save, t, 'trainval.json')) as f:
            tr = json.load(f)
        assert len(tr['images']) == 4
        assert len(tr['categories']) == 4
        with open(os.path.join(save, t, 'test.json')) as f:
            te = json.load(f)
        assert [a['mark'] for a in te['annotations']] == [0, 0, 1, 1]
        # images extracted with 4 files per (id, cam) (5th was empty)
        import glob as g
        files = g.glob(os.path.join(save, t, 'images', '00000000_0000_*'))
        assert len(files) == 4


def test_cache_url_passthrough_and_md5(tmp_path):
    from pps_tpu.utils.io import cache_url
    # non-URL passes through untouched
    assert cache_url('/some/local/path.pkl', str(tmp_path)) == \
        '/some/local/path.pkl'
    # cached file with md5 verification (seed the cache by hand — no
    # network egress in this environment)
    import hashlib
    payload = b'weights!'
    cached = tmp_path / 'cache' / 'example.com' / 'm.pkl'
    cached.parent.mkdir(parents=True)
    cached.write_bytes(payload)
    got = cache_url('https://example.com/m.pkl', str(tmp_path / 'cache'),
                    expected_md5=hashlib.md5(payload).hexdigest())
    assert got == str(cached)
    with pytest.raises(AssertionError):
        cache_url('https://example.com/m.pkl', str(tmp_path / 'cache'),
                  expected_md5='0' * 32)
