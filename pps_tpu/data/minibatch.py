"""Minibatch assembly: roidb entries -> host numpy batch.

Rebuild of /root/reference/detectron/roi_data/minibatch.py:73-148 +
reid.py:100-182 (label blobs).  Output layout is NHWC float32 (TPU), not
the reference's NCHW.
"""

import numpy as np

from pps_tpu.data import transforms


def get_minibatch_blob_names():
    return ['data', 'labels_int32', 'labels_oh']


def get_minibatch(roidb_entries, cfg, rng, train=True, decode_fn=None,
                  raw=False, raw_pad_hw=None):
    """Decode + augment + resize a list of roidb entries.

    Returns {'data': [B,H,W,3] f32 BGR mean-subtracted,
             'labels_int32': [B] (identity-1),
             'labels_oh': [B, NUM_CLASSES-1] one-hot}.

    raw=True (the TPU.DEVICE_AUGMENT wire): when every decode in the batch
    shares one shape, ship {'data_u8': [B,h,w,3] uint8, 'flipped': [B]}
    instead of 'data' — flip/augment/resize then run inside the jitted
    train step (data/device_augment.py).

    raw_pad_hw (variable-size datasets, e.g. Duke/CUHK03 raw): a dataset-
    global (H_pad, W_pad) bucket; every decode is padded bottom/right with
    numpy 'reflect' (= cv2 BORDER_REFLECT_101, so in-graph blur borders
    match the true-size chain bitwise) and the batch additionally carries
    'valid_hw' [B,2] with each sample's true size — ONE static wire shape
    for the whole dataset, so the train step compiles exactly once.
    Batches that don't fit the contract (mixed sizes with no bucket, or a
    decode exceeding the bucket) fall back to the host chain below.
    """
    decode_fn = decode_fn or transforms.decode_image
    w, h = cfg.REID.SCALE
    num_classes = cfg.MODEL.NUM_CLASSES
    b = len(roidb_entries)
    labels = np.asarray([e['gt_class'] - 1 for e in roidb_entries],
                        np.int32)  # ids are 1-based, 0=background
    oh = np.zeros((b, num_classes - 1), np.float32)
    oh[np.arange(b), labels] = 1.0

    ims = [decode_fn(entry['image']) for entry in roidb_entries]
    if raw and train:
        flipped = np.asarray(
            [bool(e.get('flipped')) for e in roidb_entries])
        if raw_pad_hw is None:
            if all(im.shape == ims[0].shape for im in ims):
                return {'data_u8': np.stack(ims), 'flipped': flipped,
                        'labels_int32': labels, 'labels_oh': oh}
        else:
            ph, pw = raw_pad_hw
            # (>= 2 per axis: numpy 'reflect' needs a value to reflect)
            if all(2 <= im.shape[0] <= ph and 2 <= im.shape[1] <= pw
                   for im in ims):
                padded = np.stack([
                    np.pad(im, ((0, ph - im.shape[0]),
                                (0, pw - im.shape[1]), (0, 0)),
                           mode='reflect') for im in ims])
                valid_hw = np.asarray(
                    [im.shape[:2] for im in ims], np.int32)
                return {'data_u8': padded, 'flipped': flipped,
                        'valid_hw': valid_hw,
                        'labels_int32': labels, 'labels_oh': oh}

    data = np.empty((b, h, w, 3), np.float32)
    pixel_means = np.asarray(cfg.PIXEL_MEANS)
    for i, (entry, im) in enumerate(zip(roidb_entries, ims)):
        if entry.get('flipped'):
            im = im[:, ::-1, :]
        if train:
            im = transforms.augment(im, rng, cfg)
        data[i] = transforms.prep_im_for_blob(im, pixel_means, (w, h))
    return {'data': data, 'labels_int32': labels, 'labels_oh': oh}
