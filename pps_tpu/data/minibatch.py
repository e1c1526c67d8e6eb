"""Minibatch assembly: roidb entries -> host numpy batch.

Rebuild of /root/reference/detectron/roi_data/minibatch.py:73-148 +
reid.py:100-182 (label blobs).  Output layout is NHWC float32 (TPU), not
the reference's NCHW.
"""

import numpy as np

from pps_tpu.data import transforms


def get_minibatch_blob_names():
    return ['data', 'labels_int32', 'labels_oh']


def get_minibatch(roidb_entries, cfg, rng, train=True, decode_fn=None):
    """Decode + augment + resize a list of roidb entries.

    Returns {'data': [B,H,W,3] f32 BGR mean-subtracted,
             'labels_int32': [B] (identity-1),
             'labels_oh': [B, NUM_CLASSES-1] one-hot}.
    """
    decode_fn = decode_fn or transforms.decode_image
    w, h = cfg.REID.SCALE
    num_classes = cfg.MODEL.NUM_CLASSES
    b = len(roidb_entries)
    data = np.empty((b, h, w, 3), np.float32)
    labels = np.empty((b,), np.int32)
    pixel_means = np.asarray(cfg.PIXEL_MEANS)
    for i, entry in enumerate(roidb_entries):
        im = decode_fn(entry['image'])
        if entry.get('flipped'):
            im = im[:, ::-1, :]
        if train:
            im = transforms.augment(im, rng, cfg)
        data[i] = transforms.prep_im_for_blob(im, pixel_means, (w, h))
        labels[i] = entry['gt_class'] - 1  # ids are 1-based, 0=background
    oh = np.zeros((b, num_classes - 1), np.float32)
    oh[np.arange(b), labels] = 1.0
    return {'data': data, 'labels_int32': labels, 'labels_oh': oh}
