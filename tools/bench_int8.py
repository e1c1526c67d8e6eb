"""int8 PTQ extraction shootout vs the bf16 (and BN-folded bf16) path.

Measures steady-state extraction throughput of the flagship model on the
visible chip under three serving configurations:
  bf16        — the default extraction graph (bench.py headline)
  bf16+fold   — BN folded into the convs (models/folding.py)
  int8        — folded + body PTQ-quantized (models/quantize.py)

Slope-method timing (CLAUDE.md protocol).  Also reports the embedding
fidelity of the int8 path vs bf16 (cosine) so the speed number is tied
to an accuracy bound.  Win-or-retire evidence for TPU.INT8_EVAL.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _throughput(fn, args, batch, iters=20, warmup=3):
    import jax.numpy as jnp

    def run(n):
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out))
        return time.perf_counter() - t0

    for _ in range(warmup):
        run(1)
    t_small = run(2)
    t_big = run(2 + iters)
    return batch * iters / (t_big - t_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--depth', type=int, default=50, choices=(50, 101, 152),
                    help='ResNet body depth (does the bandwidth-bound '
                         'int8 story hold as depth grows?)')
    args = ap.parse_args()
    import jax
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    import __graft_entry__ as g
    from pps_tpu.models.model import build_model
    from pps_tpu.models.folding import fold_conv_bn
    from pps_tpu.models.quantize import quantize_for_eval

    cfg = g._flagship_cfg(depth=args.depth)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # plausible running stats so folding/quantization see realistic scales
    rng = np.random.RandomState(0)
    import jax.numpy as jnp
    for k in list(state):
        if k.endswith('_rm'):
            state[k] = jnp.asarray(
                rng.randn(*state[k].shape).astype('f4') * 0.1)
        if k.endswith('_riv'):
            state[k] = jnp.asarray(
                rng.rand(*state[k].shape).astype('f4') + 0.5)

    n_chips = len(jax.devices())
    w, h = cfg.REID.SCALE
    batch = 512 * n_chips
    images = rng.randn(batch, h, w, 3).astype(np.float32) * 50
    dev_images = jax.device_put(images)

    folded = fold_conv_bn(params, state)
    t0 = time.time()
    qparams = quantize_for_eval(model, params, state, images[:256])
    t_q = time.time() - t0

    fn = jax.jit(lambda p, s, x: model.extract_features(p, s, x))

    res = {}
    feats = {}
    for name, p in (('bf16', params), ('bf16_fold', folded),
                    ('int8', qparams)):
        p = jax.device_put(p)
        res[name] = _throughput(fn, (p, state, dev_images), batch) / n_chips
        feats[name] = np.asarray(fn(p, state, dev_images[:64]))

    def cos(a, b):
        num = np.sum(a * b, axis=1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return num / np.maximum(den, 1e-12)

    print(json.dumps({
        'imgs_per_sec_per_chip': {k: round(v, 1) for k, v in res.items()},
        'int8_speedup_vs_bf16': round(res['int8'] / res['bf16'], 3),
        'int8_speedup_vs_fold': round(res['int8'] / res['bf16_fold'], 3),
        'fold_speedup_vs_bf16': round(res['bf16_fold'] / res['bf16'], 3),
        'int8_cosine_vs_bf16_min': float(
            cos(feats['int8'], feats['bf16']).min()),
        'int8_cosine_vs_bf16_mean': float(
            cos(feats['int8'], feats['bf16']).mean()),
        'calib_quantize_seconds': round(t_q, 1),
        'depth': args.depth,
        'batch': batch,
        'device_kind': jax.devices()[0].device_kind,
    }))


if __name__ == '__main__':
    main()
