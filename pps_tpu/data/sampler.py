"""Batch index sampling: shuffled rotation + P x K triplet sampling +
the TRIPLET_LOSS_CROSS epoch-alternation schedule.

Rebuild of the sampling logic of
/root/reference/detectron/roi_data/loader.py:94-101,135-142,177-251 and the
epoch-alternation in /root/reference/detectron/utils/train.py:69-96, but as
*pure host-side functions of the step counter*: the reference interleaved a
mutable (iter, gpu) cursor between loader threads and the train loop to keep
alternation deterministic (forcing a single loader thread); here the
schedule is a function, so any number of prefetch workers stays correct.

Epoch math (reference loader.py:135-142):
  iters/epoch          = len(roidb) // global_batch   (roidb already
                         contains the flipped duplicates; the reference's
                         '//2 if USE_FLIPPED' with the doubled roidb is the
                         same number)
  triplet iters/epoch  = num_classes // P_global

Alternation (reference train.py:69-77, loader.py:212-220): with
TRIPLET_LOSS_CROSS, epochs e with e > TRIPLET_LOSS_START and e odd run only
the first `triplet iters/epoch` steps of the epoch, with P x K batches and
loss_scale_factor=1; all other epochs run full-length with shuffled batches
and loss_scale_factor=0.  Without CROSS, every batch is P x K.
"""

import numpy as np


class PermSampler(object):
    """Shuffled-rotation sampler (reference loader.py:177-211 deque)."""

    def __init__(self, n, batch_size, seed=0):
        self._n = n
        self._b = batch_size
        self._rng = np.random.RandomState(seed)
        self._shuffle()

    def _shuffle(self):
        self._perm = self._rng.permutation(self._n)
        self._pos = 0
        self._consumed = 0

    def next_batch(self):
        idx = [int(self._perm[(self._pos + i) % self._n])
               for i in range(self._b)]
        self._pos = (self._pos + self._b) % self._n
        self._consumed += self._b
        if self._consumed >= self._n:
            self._shuffle()
        return idx


class PKSampler(object):
    """P identities x K instances (reference loader.py:237-251)."""

    def __init__(self, labels, p, k, seed=0):
        self._class2idx = {}
        for i, lab in enumerate(labels):
            self._class2idx.setdefault(int(lab), []).append(i)
        self.num_classes = len(self._class2idx)
        self._p, self._k = p, k
        self._rng = np.random.RandomState(seed)
        self._pool = []

    def next_batch(self):
        if len(self._pool) < self._p:
            self._pool = list(self._class2idx.keys())
            self._rng.shuffle(self._pool)
        idx = []
        for _ in range(self._p):
            key = self._pool.pop()
            population = self._class2idx[key]
            if len(population) < self._k:
                population = population * self._k
            sel = self._rng.choice(len(population), size=self._k,
                                   replace=False)
            idx.extend(population[i] for i in sel)
        return idx


class EpochSchedule(object):
    """Pure schedule: step -> (epoch, mode, loss_scale_factor).

    mode is 'perm' or 'pk'.  Steps are *global* (one mesh-wide batch per
    step).  iters_per_epoch counts only executed steps: on alternation
    epochs the reference `continue`s through the skipped tail without
    running the net (train.py:73-74), so its wall-clock epoch is our
    shortened one.
    """

    def __init__(self, cfg, num_images, num_classes_present):
        self.global_batch = cfg.TRAIN.IMS_PER_BATCH * cfg.NUM_GPUS
        self.ipe = max(1, num_images // self.global_batch)
        self.triplet = cfg.REID.TRIPLET_LOSS
        self.cross = self.triplet and cfg.REID.TRIPLET_LOSS_CROSS
        self.tl_start = cfg.REID.TRIPLET_LOSS_START
        p_global = cfg.REID.P * cfg.NUM_GPUS
        self.ipe_triplet = max(1, num_classes_present // p_global) \
            if self.triplet else 0
        self.max_epoch = cfg.SOLVER.MAX_ITER

    def is_triplet_epoch(self, ep):
        return self.cross and ep > self.tl_start and ep % 2 == 1

    def epoch_len(self, ep):
        if self.is_triplet_epoch(ep):
            return min(self.ipe_triplet, self.ipe)
        return self.ipe

    def describe(self, ep, it_in_epoch):
        """(mode, loss_scale) for executed step it_in_epoch of epoch ep."""
        if not self.triplet:
            return 'perm', 0.0
        if not self.cross:
            return 'pk', 1.0
        if self.is_triplet_epoch(ep):
            return 'pk', 1.0
        return 'perm', 0.0

    def total_steps(self):
        return sum(self.epoch_len(e) for e in range(self.max_epoch))

    def steps_before_epoch(self, ep):
        return sum(self.epoch_len(e) for e in range(ep))

    def lr_iter(self, ep, it_in_epoch):
        """The reference LR policy indexes by raw cur_iter = ep*ipe + i
        (train.py:85); reconstruct that from (epoch, executed step)."""
        return ep * self.ipe + it_in_epoch
