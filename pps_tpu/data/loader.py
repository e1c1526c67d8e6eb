"""Prefetching data loader: host decode workers -> device-sharded batches.

Replaces the reference's loader-thread / BlobsQueue / DequeueBlobs pipeline
(/root/reference/detectron/roi_data/loader.py) with the jax equivalent: a
pool of decode workers builds host batches ahead of time, and the consumer
thread `jax.device_put`s them with the mesh batch sharding so the next
batch's H2D copy overlaps the current step's compute (the BlobsQueue
analog).

Unlike the reference — which had to force a single loader thread to keep
the triplet epoch alternation deterministic (loader.py:94-101) — batch
composition here is decided up front by the pure `EpochSchedule`, so
workers only ever execute a precomputed plan and parallelism never affects
what is sampled.
"""

import logging
import queue
import threading

import numpy as np

from pps_tpu.data import minibatch as minibatch_lib
from pps_tpu.data.sampler import EpochSchedule, PermSampler, PKSampler

logger = logging.getLogger(__name__)


class ReIDLoader(object):
    def __init__(self, roidb, cfg, num_workers=None, prefetch=None,
                 seed=None, decode_fn=None, device_put_fn=None, raw=False,
                 device_prefetch=None):
        """num_workers / prefetch / device_prefetch default from the
        DATA_LOADER cfg block — the reference sized its loader from
        exactly these keys (reference roi_data/loader.py:67-101):
        NUM_THREADS -> decode workers, MINIBATCH_QUEUE_SIZE -> host
        batches prepared ahead, BLOBS_QUEUE_CAPACITY -> device batches
        transferred ahead of the consumer (the BlobsQueue depth)."""
        self._roidb = roidb
        self._cfg = cfg
        if num_workers is None:
            num_workers = cfg.DATA_LOADER.NUM_THREADS
        if prefetch is None:
            prefetch = cfg.DATA_LOADER.MINIBATCH_QUEUE_SIZE
        if device_prefetch is None:
            device_prefetch = cfg.DATA_LOADER.BLOBS_QUEUE_CAPACITY
        self._device_prefetch = max(1, int(device_prefetch))
        self._decode_fn = decode_fn
        self._device_put_fn = device_put_fn
        # uint8 wire for on-device augmentation.  The wire shape must be
        # decided ONCE from dataset metadata, never per batch: every
        # distinct uint8 shape compiles a fresh train-step graph
        # (25-350 s on TPU), so opportunistic per-batch switching on a
        # mixed-size set would stall mid-epoch nondeterministically.
        #   uniform sizes  -> raw wire at that shape
        #   varying sizes  -> pad every decode to the dataset-global
        #                     bucket; minibatch.py ships valid_hw
        #   missing height/width metadata -> host chain (stable graphs)
        self._raw_pad_hw = None
        if raw:
            sizes = {(e.get('height'), e.get('width')) for e in roidb}
            if not sizes or any(None in s for s in sizes):
                if sizes:
                    logger.warning(
                        'roidb lacks height/width metadata; disabling the '
                        'uint8 device-augment wire (host chain instead)')
                    raw = False
            elif len(sizes) > 1:
                self._raw_pad_hw = (max(s[0] for s in sizes),
                                    max(s[1] for s in sizes))
        self._raw = raw
        self._prefetch = prefetch
        self._num_workers = num_workers
        seed = cfg.RNG_SEED if seed is None else seed
        self._seed = seed

        labels = [e['gt_class'] - 1 for e in roidb]
        n_ids = len(set(labels))
        self.schedule = EpochSchedule(cfg, len(roidb), n_ids)
        self._perm = PermSampler(len(roidb), self.schedule.global_batch,
                                 seed=seed)
        self._pk = None
        if cfg.REID.TRIPLET_LOSS:
            self._pk = PKSampler(labels, cfg.REID.P * cfg.NUM_GPUS,
                                 cfg.REID.K, seed=seed + 1)

        self._plan_q = queue.Queue()
        self._out_q = None
        self._workers = []
        self._stop = threading.Event()
        self._exc = []
        self._last_qsize = 0

    # -- plan ---------------------------------------------------------------
    def skip_epochs(self, n):
        """Advance the samplers past the first n epochs without decoding,
        so training resumed at epoch n samples exactly like a continuous
        run (the reference restored its loader cursor via set_start_iter,
        loader.py:124 + train.py:214)."""
        for ep in range(n):
            self.plan_epoch(ep)

    def plan_epoch(self, ep):
        """[(step_in_epoch, mode, loss_scale, indices)] for epoch ep.
        Sampling happens here, single-threaded => deterministic."""
        plan = []
        for i in range(self.schedule.epoch_len(ep)):
            mode, scale = self.schedule.describe(ep, i)
            if mode == 'pk':
                idx = self._pk.next_batch()
            else:
                idx = self._perm.next_batch()
            plan.append((i, mode, scale, idx))
        return plan

    # -- worker pool --------------------------------------------------------
    def _worker(self, wid):
        while not self._stop.is_set():
            try:
                item = self._plan_q.get(timeout=0.1)
            except queue.Empty:
                continue
            if item is None:
                return
            slot, (i, mode, scale, idx) = item
            try:
                # augmentation rng keyed by (epoch, step), NOT by worker:
                # batch->worker assignment is racy, so per-worker streams
                # would make augmentation depend on thread scheduling.
                rng = np.random.RandomState(
                    (self._seed * 1000003 + self._cur_ep * 10007 + i)
                    % (2 ** 31))
                entries = [self._roidb[j] for j in idx]
                batch = minibatch_lib.get_minibatch(
                    entries, self._cfg, rng, train=True,
                    decode_fn=self._decode_fn, raw=self._raw,
                    raw_pad_hw=self._raw_pad_hw)
                self._slots[slot] = (i, mode, scale, batch)
            except Exception as e:  # propagate to consumer (coordinator.py)
                logger.exception('loader worker failed')
                self._exc.append(e)
                self._stop.set()
                return
            finally:
                self._sem.release()

    def iter_epoch(self, ep, start_step=0):
        """Yield (step_in_epoch, loss_scale, device_batch) for epoch ep.
        Batches are produced by the worker pool but yielded strictly in
        plan order.

        start_step > 0 resumes mid-epoch (the preemption path): the FULL
        epoch is still planned — consuming sampler state exactly like a
        continuous run — and the already-trained prefix is skipped before
        any decode work, so batch composition from start_step on is
        bitwise identical to the uninterrupted stream."""
        plan = self.plan_epoch(ep)
        if start_step:
            plan = plan[start_step:]
        if not plan:
            return
        self._cur_ep = ep
        self._dev_ready = {}  # slot -> device batch transferred ahead
        self._slots = [None] * len(plan)
        self._sem = threading.Semaphore(0)
        self._stop.clear()
        self._exc = []
        # bound how far ahead workers run via a bounded plan queue refill
        workers = [threading.Thread(target=self._worker, args=(w,),
                                    daemon=True)
                   for w in range(self._num_workers)]
        for w in workers:
            w.start()
        issued = 0
        for slot in range(min(self._prefetch, len(plan))):
            self._plan_q.put((slot, plan[slot]))
            issued += 1
        try:
            for step in range(len(plan)):
                while self._slots[step] is None:
                    self._sem.acquire()
                    if self._exc:
                        raise RuntimeError('data loader worker failed') \
                            from self._exc[0]
                i, mode, scale, batch = self._slots[step]
                self._slots[step] = None
                # prepared-ahead depth: the BlobsQueue qsize analog
                # (reference training_stats.py:81-83); 0 = consumer starved
                self._last_qsize = sum(
                    1 for s in self._slots[step + 1:issued]
                    if s is not None)
                if issued < len(plan):
                    self._plan_q.put((issued, plan[issued]))
                    issued += 1
                if mode == 'pk':
                    self._check_pk(batch['labels_int32'])
                if self._device_put_fn is not None:
                    dev = self._dev_ready.pop(step, None)
                    if dev is None:
                        dev = self._device_put_fn(batch)
                    # transfer up to BLOBS_QUEUE_CAPACITY decoded batches
                    # ahead of the consumer (device_put is async, so the
                    # H2D copies overlap the current step's compute — the
                    # BlobsQueue analog, reference loader.py:256-279)
                    for s in range(step + 1,
                                   min(step + 1 + self._device_prefetch,
                                       issued)):
                        if s not in self._dev_ready and \
                                self._slots[s] is not None:
                            self._dev_ready[s] = self._device_put_fn(
                                self._slots[s][3])
                    batch = dev
                yield i, scale, batch
        finally:
            self._stop.set()
            while not self._plan_q.empty():
                try:
                    self._plan_q.get_nowait()
                except queue.Empty:
                    break
            for w in workers:
                w.join(timeout=2.0)

    def qsize(self):
        """Number of batches prepared ahead of the consumer at the last
        yield (the reference's minibatch-queue depth gauge)."""
        return self._last_qsize

    def _check_pk(self, labels):
        """Runtime P x K composition assert (reference train.py:88-96)."""
        cfg = self._cfg
        _, counts = np.unique(labels, return_counts=True)
        assert counts.shape[0] == cfg.REID.P * cfg.NUM_GPUS, counts
        assert (counts == cfg.REID.K).all(), counts
