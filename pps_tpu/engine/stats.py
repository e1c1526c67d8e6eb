"""Per-iteration training statistics + json_stats logging.

Rebuild of /root/reference/detectron/utils/training_stats.py: median-window
smoothing per loss/metric, ETA, and the single-line ``json_stats:`` record
(whose format downstream log parsers rely on, reference utils/logging.py:32).

TPU twist: the train step returns *device* scalars; forcing them to host
every iteration would serialize the pipeline.  ``UpdateIterStats`` therefore
stashes the device dict and only materializes (blocks) when a log line is
actually emitted.
"""

import datetime

import numpy as np

from pps_tpu.utils.logging import SmoothedValue, log_json_stats
from pps_tpu.utils.timer import Timer


class TrainingStats(object):
    LOG_PERIOD = 20
    WIN_SZ = 20

    def __init__(self, max_iter, log_period=None):
        self.max_iter = max_iter
        if log_period:
            self.LOG_PERIOD = log_period
        self.iter_timer = Timer()
        self.smoothed_losses_and_metrics = {}
        self.smoothed_total_loss = SmoothedValue(self.WIN_SZ)
        # loader prepared-ahead depth (reference training_stats.py:54,81-83)
        self.smoothed_mb_qsize = SmoothedValue(self.WIN_SZ)
        self._pending = []
        # None until the first drain: the NaN abort must not trigger on
        # the initial value (a resumed run's step counter can reach the
        # check period before the first emitted log line)
        self.iter_total_loss = None

    def IterTic(self):
        self.iter_timer.tic()

    def IterToc(self):
        return self.iter_timer.toc(average=False)

    def ResetIterTimer(self):
        self.iter_timer.reset()

    def UpdateIterStats(self, logs, mb_qsize=None):
        """logs: dict of scalar device arrays from the train step.
        mb_qsize: loader prepared-ahead depth (host int, gauged now —
        it describes this instant, unlike the lazily-drained device logs)."""
        self._pending.append(logs)
        if mb_qsize is not None:
            self.smoothed_mb_qsize.AddValue(mb_qsize)

    def _drain(self):
        # start every D2H copy async BEFORE materializing any of them:
        # a log period holds ~20 iterations x ~200 per-combo scalars, and
        # fetching them one blocking np.asarray at a time pays a device
        # round trip each (measured 5 s/step amortized over a tunneled
        # PJRT link); pipelined prefetch makes the drain one round trip
        for logs in self._pending:
            for v in logs.values():
                if hasattr(v, 'copy_to_host_async'):
                    v.copy_to_host_async()
        for logs in self._pending:
            host = {k: float(np.asarray(v)) for k, v in logs.items()}
            for k, v in host.items():
                if k in ('lr',):
                    continue
                if k not in self.smoothed_losses_and_metrics:
                    self.smoothed_losses_and_metrics[k] = SmoothedValue(
                        self.WIN_SZ)
                self.smoothed_losses_and_metrics[k].AddValue(v)
            self.iter_total_loss = host.get('loss', np.nan)
            self.smoothed_total_loss.AddValue(self.iter_total_loss)
        self._pending = []

    def loss_is_nan(self):
        return (self.iter_total_loss is not None
                and np.isnan(self.iter_total_loss))

    def LogIterStats(self, cur_iter, lr, extra=None, force=False):
        if (force or cur_iter % self.LOG_PERIOD == 0
                or cur_iter == self.max_iter - 1):
            self._drain()
            stats = self.GetStats(cur_iter, lr)
            if extra:
                stats.update(extra)
            log_json_stats(stats)

    def GetStats(self, cur_iter, lr):
        eta_seconds = self.iter_timer.average_time * (
            self.max_iter - cur_iter)
        eta = str(datetime.timedelta(seconds=int(eta_seconds)))
        stats = dict(
            iter=cur_iter,
            lr=float(lr),
            time=self.iter_timer.average_time,
            eta=eta,
            loss=self.smoothed_total_loss.GetMedianValue(),
        )
        if self.smoothed_mb_qsize.count:
            # int-rounded average, the reference's mb_qsize contract
            # (training_stats.py:107-108)
            stats['mb_qsize'] = int(
                np.round(self.smoothed_mb_qsize.GetAverageValue()))
        mem = device_mem_mb()
        if mem is not None:
            stats['mem'] = mem  # MB in use on device 0 (the reference
            # logged C2 gpu mem the same way, training_stats.py:99-100)
        for k, v in self.smoothed_losses_and_metrics.items():
            stats[k] = v.GetMedianValue()
        return stats


def device_mem_mb():
    """Bytes in use on device 0, in MB; None when the backend doesn't
    report memory stats (CPU)."""
    try:
        import jax
        ms = jax.local_devices()[0].memory_stats()
        if ms and 'bytes_in_use' in ms:
            return int(ms['bytes_in_use'] / (1024 * 1024))
    except Exception:
        pass
    return None
