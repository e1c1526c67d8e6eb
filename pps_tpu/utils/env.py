"""Runtime environment helpers (the reference's utils/env.py analog —
locating native libs lives in pps_tpu/native; here: jax process setup)."""

import os


def apply_platform_env():
    """Honor $JAX_PLATFORMS even when a site customization pins another
    platform programmatically after env parsing (this harness's TPU
    plugin does); a no-op when the variable is unset or the backend is
    already initialized.  Called at CLI entry so
    `JAX_PLATFORMS=cpu python tools/train_net.py ...` works as the jax
    docs promise."""
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        try:
            import jax
            jax.config.update('jax_platforms', plat)
        except Exception:
            pass


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
