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


def cache_url(url_or_file, cache_dir, expected_md5=None):
    """Download a URL to ``cache_dir`` and return the cached path; non-URLs
    pass through (reference utils/io.py:86-130, generalized: any http(s)
    URL is accepted instead of only the Detectron S3 bucket, and the md5
    check takes an explicit expected hash or a ``<url>.md5sum`` side file
    rather than the S3-specific reference-hash scheme)."""
    import hashlib
    import re
    import urllib.request

    if re.match(r'^(?:http)s?://', url_or_file, re.IGNORECASE) is None:
        return url_or_file
    url = url_or_file
    name = url.split('://', 1)[1]
    cache_file_path = os.path.join(cache_dir, name)
    if not os.path.exists(cache_file_path):
        d = os.path.dirname(cache_file_path)
        if d and not os.path.exists(d):
            os.makedirs(d)
        tmp = cache_file_path + '.tmp'
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, cache_file_path)
    if expected_md5 is not None:
        md5 = hashlib.md5()
        with open(cache_file_path, 'rb') as f:
            for chunk in iter(lambda: f.read(1 << 20), b''):
                md5.update(chunk)
        got = md5.hexdigest()
        assert got == expected_md5, (
            'md5 mismatch for cached {}: {} vs expected {}'.format(
                url, got, expected_md5))
    return cache_file_path
