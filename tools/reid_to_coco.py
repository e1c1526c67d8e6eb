#!/usr/bin/env python
"""Dataset preparation: raw re-ID datasets -> images dir + COCO-style json.

Rebuild of the reference two-stage pipeline
(/root/reference/tools/dataset/transform_market1501.py + transform_duke.py
-> partitions.pkl -> /root/reference/tools/bpm_to_coco.py -> json) as one
tool with two entry modes:

  from-partitions: consume an existing PCB-format ``partitions.pkl``
      (trainval_im_names / trainval_ids2labels / test_im_names /
      test_marks) + images dir, write trainval.json/test.json.  Works for
      market1501 / duke / cuhk03 prepared with the reference scripts.

  from-raw: consume a raw Market-1501 / DukeMTMC-reID directory (the
      unzipped distribution), rename images to the
      ``{id:08d}_{cam:04d}_{seq:08d}.jpg`` convention
      (transform_market1501.py:60), assign marks (query=0, gallery=1,
      multi-query=2 from gt_bbox for market), and write both jsons.

json format matches the reference converter: categories carry the raw
0-based identity labels; annotations carry ``mark`` and
``classes_or_attributions: 0`` (bpm_to_coco.py:120-143).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import glob
import json
import os
import pickle
import shutil
from collections import defaultdict


NEW_IM_NAME_TMPL = '{:08d}_{:04d}_{:08d}.jpg'


def _image_size(path):
    from PIL import Image
    with Image.open(path) as im:
        return im.size  # (w, h)


def _coco_skeleton(ids2labels):
    return {
        'info': {'description': 'pps-tpu re-ID dataset'},
        'licenses': [],
        'categories': [{'id': v, 'name': str(k), 'supercategory': None}
                       for k, v in sorted(ids2labels.items())],
        'images': [],
        'annotations': [],
    }


def write_coco_json(im_dir, im_names, ids2labels, marks, out_path):
    coco = _coco_skeleton(ids2labels)
    image_id = 1
    for idx, name in enumerate(im_names):
        path = os.path.join(im_dir, name)
        w, h = _image_size(path)
        coco['images'].append({
            'id': image_id, 'file_name': os.path.basename(name),
            'width': w, 'height': h})
        pid = int(os.path.basename(name)[:8])
        ann = {
            'id': image_id, 'image_id': image_id,
            'category_id': ids2labels[pid],
            'iscrowd': 0, 'area': w * h, 'bbox': [0, 0, w, h],
            'segmentation': [[0, 0, w, 0, w, h, 0, h]],
            'classes_or_attributions': 0,
        }
        if marks is not None:
            ann['mark'] = int(marks[idx])
        coco['annotations'].append(ann)
        image_id += 1
    with open(out_path, 'w') as f:
        json.dump(coco, f)
    print('wrote {} ({} images, {} identities)'.format(
        out_path, len(coco['images']), len(coco['categories'])))


def _labels_from_names(im_names):
    """0-based labels in order of first appearance
    (bpm_to_coco.py:44-52, used for test splits)."""
    ids2labels = {}
    for name in im_names:
        pid = int(os.path.basename(name)[:8])
        if pid not in ids2labels:
            ids2labels[pid] = len(ids2labels)
    return ids2labels


def from_partitions(save_dir):
    pkl_path = os.path.join(save_dir, 'partitions.pkl')
    with open(pkl_path, 'rb') as f:
        pkl = pickle.load(f, encoding='latin1')
    im_dir = os.path.join(save_dir, 'images')
    for split in ('trainval', 'test'):
        im_names = [str(n) for n in pkl[split + '_im_names']]
        ids2labels = pkl.get(split + '_ids2labels') or \
            _labels_from_names(im_names)
        marks = pkl.get(split + '_marks')
        write_coco_json(im_dir, im_names, ids2labels, marks,
                        os.path.join(save_dir, split + '.json'))


# -- raw-layout parsers ------------------------------------------------------

def parse_market_name(im_name, parse_type):
    """transform_market1501.py:175-183."""
    if parse_type == 'id':
        return -1 if im_name.startswith('-1') else int(im_name[:4])
    return int(im_name[4]) if im_name.startswith('-1') else int(im_name[6])


def parse_duke_name(im_name, parse_type):
    """DukeMTMC names: 0001_c2_f0046182.jpg."""
    if parse_type == 'id':
        return int(im_name.split('_')[0])
    return int(im_name.split('_')[1][1:].split('f')[0].rstrip('_'))


def _collect(raw_dir, sub, parse_fn, drop_junk=True):
    paths = sorted(glob.glob(os.path.join(raw_dir, sub, '*.jpg')))
    if drop_junk:
        paths = [p for p in paths
                 if parse_fn(os.path.basename(p), 'id') != -1]
    return paths


def _move_ims(im_paths, new_im_dir, parse_fn, counter):
    os.makedirs(new_im_dir, exist_ok=True)
    names = []
    for p in im_paths:
        base = os.path.basename(p)
        pid = parse_fn(base, 'id')
        cam = parse_fn(base, 'cam')
        counter[(pid, cam)] += 1
        name = NEW_IM_NAME_TMPL.format(pid, cam, counter[(pid, cam)] - 1)
        dst = os.path.join(new_im_dir, name)
        if not os.path.exists(dst):
            shutil.copy(p, dst)
        names.append(name)
    return names


def from_raw(raw_dir, save_dir, dataset):
    parse_fn = {'market1501': parse_market_name,
                'duke': parse_duke_name}[dataset]
    train_sub = 'bounding_box_train'
    gallery_sub = 'bounding_box_test'
    query_sub = 'query'
    im_dir = os.path.join(save_dir, 'images')
    counter = defaultdict(int)

    train = _collect(raw_dir, train_sub, parse_fn)
    gallery = _collect(raw_dir, gallery_sub, parse_fn)
    query = _collect(raw_dir, query_sub, parse_fn)
    train_names = _move_ims(train, im_dir, parse_fn, counter)
    gallery_names = _move_ims(gallery, im_dir, parse_fn, counter)
    query_names = _move_ims(query, im_dir, parse_fn, counter)

    mq_names, mq_marks = [], []
    gt_bbox = os.path.join(raw_dir, 'gt_bbox')
    if dataset == 'market1501' and os.path.isdir(gt_bbox):
        q_ids_cams = {(parse_fn(os.path.basename(p), 'id'),
                       parse_fn(os.path.basename(p), 'cam')) for p in query}
        mq = [p for p in _collect(raw_dir, 'gt_bbox', parse_fn)
              if (parse_fn(os.path.basename(p), 'id'),
                  parse_fn(os.path.basename(p), 'cam')) in q_ids_cams]
        mq_names = _move_ims(mq, im_dir, parse_fn, counter)
        mq_marks = [2] * len(mq_names)

    trainval_ids = sorted({int(n[:8]) for n in train_names})
    ids2labels = {pid: i for i, pid in enumerate(trainval_ids)}
    write_coco_json(im_dir, train_names, ids2labels, None,
                    os.path.join(save_dir, 'trainval.json'))

    test_names = query_names + mq_names + gallery_names
    test_marks = [0] * len(query_names) + mq_marks + [1] * len(gallery_names)
    write_coco_json(im_dir, test_names, _labels_from_names(test_names),
                    test_marks, os.path.join(save_dir, 'test.json'))


def extract_cuhk03_mat(mat_file, save_dir):
    """Extract cuhk-03.mat (HDF5/v7.3) into labeled/ and detected/ image
    dirs with the PCB naming (reference transform_cuhk03.py:178-217):
    per camera pair, per identity, columns 0:5 = cam 0, 5:10 = cam 1;
    v7.3 arrays are stored transposed, hence the .T on deref."""
    import cv2
    import h5py

    mat = h5py.File(mat_file, 'r')

    def deref(ref):
        return mat[ref][:].T

    dirs = {t: os.path.join(save_dir, t, 'images')
            for t in ('labeled', 'detected')}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def dump(refs, pid, cam, im_dir):
        for i, ref in enumerate(refs):
            im = deref(ref)
            if im.size == 0 or im.ndim < 2:
                break
            name = NEW_IM_NAME_TMPL.format(pid, cam, i)
            # mat images are RGB; cv2 writes BGR
            cv2.imwrite(os.path.join(im_dir, name), im[:, :, ::-1])

    pid = 0
    for lab_ref, det_ref in zip(mat['labeled'][0], mat['detected'][0]):
        labeled, detected = deref(lab_ref), deref(det_ref)
        assert labeled.shape == detected.shape
        for i in range(labeled.shape[0]):
            dump(labeled[i, :5], pid, 0, dirs['labeled'])
            dump(labeled[i, 5:], pid, 1, dirs['labeled'])
            dump(detected[i, :5], pid, 0, dirs['detected'])
            dump(detected[i, 5:], pid, 1, dirs['detected'])
            pid += 1
    print('extracted {} identities'.format(pid))


def from_cuhk03_mat(mat_file, split_pkl, save_dir):
    """cuhk-03.mat + the (externally provided, like the reference)
    train/test split pkl -> labeled/ + detected/ images and jsons."""
    extract_cuhk03_mat(mat_file, save_dir)
    with open(split_pkl, 'rb') as f:
        split = pickle.load(f, encoding='latin1')
    for im_type in ('detected', 'labeled'):
        part = split[im_type]
        type_dir = os.path.join(save_dir, im_type)
        im_dir = os.path.join(type_dir, 'images')
        trainval = [str(n) for n in part['train_im_names']]
        ids2labels = {pid: i for i, pid in enumerate(
            sorted({int(os.path.basename(n)[:8]) for n in trainval}))}
        write_coco_json(im_dir, trainval, ids2labels, None,
                        os.path.join(type_dir, 'trainval.json'))
        test = ([str(n) for n in part['query_im_names']] +
                [str(n) for n in part['gallery_im_names']])
        marks = [0] * len(part['query_im_names']) + \
            [1] * len(part['gallery_im_names'])
        write_coco_json(im_dir, test, _labels_from_names(test), marks,
                        os.path.join(type_dir, 'test.json'))


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest='mode', required=True)
    p1 = sub.add_parser('from-partitions')
    p1.add_argument('save_dir', help='dir holding partitions.pkl + images/')
    p2 = sub.add_parser('from-raw')
    p2.add_argument('raw_dir', help='unzipped distribution dir')
    p2.add_argument('save_dir')
    p2.add_argument('--dataset', choices=['market1501', 'duke'],
                    required=True)
    p3 = sub.add_parser('from-cuhk03-mat')
    p3.add_argument('mat_file', help='cuhk-03.mat from cuhk03_release')
    p3.add_argument('split_pkl',
                    help='re_ranking_train_test_split.pkl (external)')
    p3.add_argument('save_dir')
    args = parser.parse_args()
    if args.mode == 'from-partitions':
        from_partitions(args.save_dir)
    elif args.mode == 'from-cuhk03-mat':
        os.makedirs(args.save_dir, exist_ok=True)
        from_cuhk03_mat(args.mat_file, args.split_pkl, args.save_dir)
    else:
        os.makedirs(args.save_dir, exist_ok=True)
        from_raw(args.raw_dir, args.save_dir, args.dataset)


if __name__ == '__main__':
    main()
