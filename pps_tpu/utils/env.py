"""Runtime environment helpers (the reference's utils/env.py analog —
locating native libs lives in pps_tpu/native; here: jax process setup)."""

import os


def configure_jax_cache(path=None):
    """Enable the persistent XLA compilation cache.  TPU compiles of the
    flagship train/eval graphs take 25-350 s; the on-disk cache makes
    every process after the first start in seconds.  Called by the train
    and inference drivers; safe to call repeatedly or before/after jax
    backend init."""
    import jax
    path = path or os.environ.get('PPS_TPU_COMPILE_CACHE',
                                  os.path.expanduser('~/.jax_cache'))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
    except Exception:  # cache is an optimization, never fatal
        pass
