#!/usr/bin/env python
"""Measure the reference-STYLE per-image extraction loop's host costs
locally, to close the >=5x north-star accounting (BASELINE.md).

The reference test engine (reference core/test.py: test_net ->
im_detect_all per image) is strictly SERIAL per image: decode -> float32
-> -mean -> bicubic resize (blob.py:97-117) -> NCHW blob copy -> FeedBlob
-> RunNet (batch 1) -> FetchBlob, one synchronous round trip per image,
one process per GPU.  Of that loop, this harness can measure locally and
tunnel-free:

  * t_prep: the serial per-image host preprocessing (decode + blob prep
    on real Market-geometry jpg files) — pure host work, identical on
    any host;
  * t_dispatch: the per-call host overhead of a blocking jitted batch-1
    execution on the IN-PROCESS CPU backend — a lower bound for what a
    co-located (non-tunneled) accelerator sync costs;
  * t_feed: the per-image blob copy cost (f32 NCHW materialization).

The device-side batch-1 floor (t_b1, slope method on the real chip) and
the batched pipeline rate come from bench.py; pass them in or use the
recorded defaults.  Prints one JSON accounting line.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))


def _median(xs):
    return float(np.median(np.asarray(xs)))


def _spread(xs):
    """(max-min)/median — the reproducibility figure published next to
    every measured rate in this repo (BASELINE.md protocol)."""
    xs = np.asarray(xs, np.float64)
    return float((xs.max() - xs.min()) / np.median(xs))


def bench_prep(n_images=300, reps=5, scale_wh=(128, 384), src_hw=(128, 64)):
    """Serial reference-style blob prep on real jpg files: cv2.imread ->
    astype f32 -> -PIXEL_MEANS -> INTER_CUBIC resize -> NCHW copy.
    Returns (ms/img prep, ms/img nchw copy)."""
    import cv2
    cv2.setNumThreads(0)  # the reference loop is single-threaded
    d = '/tmp/bench_ref_loop_imgs'
    os.makedirs(d, exist_ok=True)
    paths = []
    rng = np.random.RandomState(0)
    for i in range(n_images):
        p = os.path.join(d, '%04d.jpg' % i)
        if not os.path.exists(p):
            cv2.imwrite(p, rng.randint(0, 255, (src_hw[0], src_hw[1], 3),
                                       np.uint8))
        paths.append(p)
    means = np.array([[[102.9801, 115.9465, 122.7717]]], np.float32)
    prep_ms, copy_ms = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        blobs = []
        for p in paths:
            im = cv2.imread(p).astype(np.float32) - means
            blobs.append(cv2.resize(im, scale_wh,
                                    interpolation=cv2.INTER_CUBIC))
        t1 = time.perf_counter()
        for b in blobs:
            _ = np.ascontiguousarray(b.transpose(2, 0, 1)[None])
        t2 = time.perf_counter()
        prep_ms.append((t1 - t0) / n_images * 1e3)
        copy_ms.append((t2 - t1) / n_images * 1e3)
    return _median(prep_ms), _median(copy_ms), _spread(prep_ms)


def bench_dispatch(iters=300, reps=5):
    """Per-call host overhead of a BLOCKING jitted batch-1 execution on
    the in-process CPU backend: jit call machinery + PJRT execute +
    ready-wait, no tunnel.  A lower bound for any co-located
    accelerator's per-image sync cost."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    x = jax.device_put(np.zeros((1, 64), np.float32))
    w = jax.device_put(np.zeros((64, 64), np.float32))
    f = jax.jit(lambda x, w: jnp.dot(x, w))
    f(x, w).block_until_ready()
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            f(x, w).block_until_ready()
        out.append((time.perf_counter() - t0) / iters * 1e3)
    return _median(out), _spread(out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--t-b1-ms', type=float, default=0.225,
                    help='device batch-1 forward ms/img (bench.py slope '
                         'baseline on the real chip)')
    ap.add_argument('--ours-imgs-per-sec', type=float, default=9346.0,
                    help='our batched pipeline rate (bench.py headline)')
    args = ap.parse_args()

    t_prep, t_copy, prep_spread = bench_prep()
    t_dispatch, disp_spread = bench_dispatch()

    t_ref = t_prep + t_copy + t_dispatch + args.t_b1_ms
    t_ours = 1e3 / args.ours_imgs_per_sec
    print(json.dumps({
        'metric': 'reference_style_per_image_loop_ms',
        't_prep_ms': round(t_prep, 3),
        'prep_spread_pct': round(prep_spread * 100, 1),
        't_blob_copy_ms': round(t_copy, 3),
        't_dispatch_sync_ms_lower_bound': round(t_dispatch, 4),
        'dispatch_spread_pct': round(disp_spread * 100, 1),
        't_device_b1_ms': args.t_b1_ms,
        'ref_loop_ms_per_img': round(t_ref, 3),
        'ref_loop_imgs_per_sec': round(1e3 / t_ref, 1),
        'ours_ms_per_img': round(t_ours, 4),
        'vs_ref_style_loop': round(t_ref / t_ours, 2),
        'device_only_floor': round(args.t_b1_ms / t_ours, 2),
    }))


if __name__ == '__main__':
    main()
