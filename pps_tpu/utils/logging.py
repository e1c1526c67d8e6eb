"""Logging helpers.

Keeps the reference's single-line ``json_stats: {...}`` format
(/root/reference/detectron/utils/logging.py:32-38) because downstream log
parsers (loss-vs-mAP plotting) treat the log format as an API.
"""

import json
import logging
import sys

import numpy as np


def log_json_stats(stats, sort_keys=True):
    # hack to control precision of top-level floats
    stats = {
        k: '{:.6f}'.format(v) if isinstance(v, float) else v
        for k, v in stats.items()
    }
    print('json_stats: {:s}'.format(json.dumps(stats, sort_keys=sort_keys)))


class SmoothedValue(object):
    """Track a series of values and provide access to smoothed (median +
    mean) values over a window (reference utils/logging.py:41-63).
    """

    def __init__(self, window_size):
        self.deque_vals = []
        self.window_size = window_size
        self.series = []
        self.total = 0.0
        self.count = 0

    def AddValue(self, value):
        self.deque_vals.append(value)
        if len(self.deque_vals) > self.window_size:
            self.deque_vals.pop(0)
        self.series.append(value)
        self.count += 1
        self.total += value

    def GetMedianValue(self):
        return float(np.median(self.deque_vals))

    def GetAverageValue(self):
        return float(np.mean(self.deque_vals))

    def GetGlobalAverageValue(self):
        return self.total / max(self.count, 1)


def send_email(subject, body, to):
    """Failure notifier (reference utils/logging.py:68-73): local SMTP.
    Delivery failures are logged, never raised — a missing mail daemon
    must not mask the underlying result-check failure."""
    try:
        import smtplib
        from email.mime.text import MIMEText
        s = smtplib.SMTP('localhost')
        mime = MIMEText(body)
        mime['Subject'] = subject
        mime['To'] = to
        s.sendmail('pps_tpu', to, mime.as_string())
        s.quit()
    except Exception as e:
        logging.getLogger(__name__).warning(
            'send_email to %s failed: %s', to, e)


def setup_logging(name):
    FORMAT = '%(levelname)s %(filename)s:%(lineno)4d: %(message)s'
    # Manually clear root loggers to prevent any module that may have called
    # logging.basicConfig() from blocking our logging setup
    logging.root.handlers = []
    logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)
    logger = logging.getLogger(name)
    return logger
