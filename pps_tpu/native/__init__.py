"""Native (C++) host-runtime components, loaded via ctypes.

The reference kept its performance-critical host/device code in C++/CUDA
(/root/reference/detectron/ops, built by CMake into
libcaffe2_detectron_custom_ops.so and dyndep-loaded at import,
reference utils/c2.py:47-50).  The TPU compute path here is Pallas/XLA;
this package is the host-side analog: OpenMP C++ for the eval-time hot
paths that run on CPU.  Built on demand with g++ (no pybind11 in the
image; plain C ABI + ctypes), cached next to the source.
"""

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, 'libpps_native.so')
_SRC = [os.path.join(_DIR, 'rerank.cc')]
_LIB = None
_BUILD_FAILED = False


def _build():
    cmd = ['g++', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           '-std=c++17', '-o', _SO] + _SRC
    logger.info('building native library: %s', ' '.join(cmd))
    subprocess.check_call(cmd, cwd=_DIR)


def _load():
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    try:
        newest_src = max(os.path.getmtime(s) for s in _SRC)
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest_src:
            _build()
        _LIB = ctypes.CDLL(_SO)
        _LIB.pps_rerank.restype = ctypes.c_int
        _LIB.pps_rerank.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
    except Exception:
        logger.exception('native build/load failed; numpy fallbacks in use')
        _BUILD_FAILED = True
    return _LIB


def available():
    return _load() is not None


def _as_c_float(a):
    a = np.ascontiguousarray(a, dtype=np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rerank_native(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6,
                  lambda_value=0.3):
    """C++ k-reciprocal re-ranking; same contract as
    pps_tpu.evaluation.rerank.re_ranking."""
    lib = _load()
    assert lib is not None, 'native library unavailable'
    nq, ng = q_g_dist.shape
    qg, qg_p = _as_c_float(q_g_dist)
    qq, qq_p = _as_c_float(q_q_dist)
    gg, gg_p = _as_c_float(g_g_dist)
    out = np.empty((nq, ng), np.float32)
    rc = lib.pps_rerank(qg_p, qq_p, gg_p, nq, ng, int(k1), int(k2),
                        float(lambda_value),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert rc == 0, rc
    return out
