"""Checkpoint-compatible pickle I/O.

The reference stores weights as python pickles of ``{blobs: {name: ndarray}}``
(/root/reference/detectron/utils/io.py:39-84); we read and write the same
container so checkpoints interoperate in both directions.
"""

import os
import pickle
import tempfile


def save_object(obj, file_name):
    """Save a Python object by pickling it; atomic via temp-file rename."""
    file_name = os.path.abspath(file_name)
    d = os.path.dirname(file_name)
    if d and not os.path.exists(d):
        os.makedirs(d)
    fd, tmp = tempfile.mkstemp(dir=d or '.', suffix='.tmp')
    try:
        with os.fdopen(fd, 'wb') as f:
            pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, file_name)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def load_object(file_name):
    with open(file_name, 'rb') as f:
        # latin1 lets py2-era reference pickles (numpy arrays) load
        return pickle.load(f, encoding='latin1')
