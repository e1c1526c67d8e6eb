"""Sharded batched feature extraction.

Replaces the reference's one-image-per-RunNet inference loop and its
subprocess-per-GPU dataset range sharding
(/root/reference/detectron/core/test_engine.py:184-229,259-370;
/root/reference/detectron/utils/subprocess.py:39-104): images are batched,
the batch dim is sharded over the whole mesh, and the variable gallery size
is handled by pad-and-mask (static shapes for XLA).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.parallel import mesh as mesh_lib


def make_extract_fn(model, mesh, flip_tta=False, device_preproc=None,
                    padded_wire=False):
    """jitted (params, state, images[B,H,W,3]) -> [B, E] embeddings.

    flip_tta: average features of the image and its horizontal flip
    (the TEST.BBOX_AUG.H_FLIP analog, reference core/test.py:220-339).
    device_preproc: optional (pixel_means, out_hw); when set, images are
    raw uint8 decodes and the cast / mean-subtract / cv2-exact bicubic
    resize run fused on device (data/device_preprocess.py) — 4x less H2D
    traffic and no host resize.
    padded_wire: variable-size form of device_preproc — the jitted fn
    takes a fourth arg valid_hw [B,2] and the decodes are padded to one
    dataset-global bucket shape (per-sample resize matrices, see
    data/device_preprocess.preprocess_on_device_padded).
    """
    def core(params, state, images):
        feats = model.extract_features(params, state, images)
        if flip_tta:
            feats_f = model.extract_features(params, state,
                                             images[:, :, ::-1, :])
            feats = (feats + feats_f) * 0.5
            norm = jnp.linalg.norm(feats, axis=1, keepdims=True)
            feats = feats / jnp.maximum(norm, 1e-12)
        return feats

    rep = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh, fold_model=True)

    if padded_wire:
        assert device_preproc is not None
        means, out_hw = device_preproc

        def extract_padded(params, state, images, valid_hw):
            from pps_tpu.data.device_preprocess import (
                preprocess_on_device_padded)
            x = preprocess_on_device_padded(images, valid_hw, means, out_hw)
            return core(params, state, x)

        return jax.jit(extract_padded,
                       in_shardings=(rep, rep, bsh, bsh),
                       out_shardings=bsh)

    def extract(params, state, images):
        if device_preproc is not None:
            from pps_tpu.data.device_preprocess import preprocess_on_device
            means, out_hw = device_preproc
            images = preprocess_on_device(images, means, out_hw)
        return core(params, state, images)

    return jax.jit(extract,
                   in_shardings=(rep, rep, bsh),
                   out_shardings=bsh)


def put_global_batch(sharding, arr):
    """[B, ...] host array -> device array with the batch sharding.

    Multi-host (DCN mesh under jax.distributed): every process passes the
    same globally-indexed array; each transfers only its own rows and the
    pieces assemble into one global array — the eval-side counterpart of
    train_step.shard_batch (the reference's multi-GPU eval was subprocess
    range-sharding + pickle merges on one machine, test_engine.py:184-229).
    """
    if jax.process_count() > 1:
        if arr.shape[0] % jax.process_count() != 0:
            raise ValueError(
                'global batch {} not divisible by process_count {}: the '
                'truncated shard would mis-align features to images '
                '(callers pad the tail batch to a divisible size)'.format(
                    arr.shape[0], jax.process_count()))
        rows = arr.shape[0] // jax.process_count()
        local = arr[jax.process_index() * rows:][:rows]
        return jax.make_array_from_process_local_data(sharding, local)
    return jax.device_put(arr, sharding)


def fetch_global(x):
    """Device array (possibly globally sharded) -> full numpy on every
    host.  A collective on multi-host — call in deterministic order."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def extract_features(extract_fn, params, state, images, batch_size,
                     n_devices=1, mesh=None):
    """Drive extraction over a numpy image stack [N,H,W,3] with padding.

    batch_size is the *global* batch; the tail batch is padded to keep the
    jitted shape static, then the pad rows are dropped.  Transfers are
    pipelined: the next batch's H2D copy is issued before blocking on the
    current result (the BlobsQueue prefetch analog, reference
    roi_data/loader.py:256-279), so a slow host link overlaps compute.
    Works under a multi-host mesh: every process drives the same loop over
    the same image stack; transfers and result fetches go through
    put_global_batch / fetch_global.
    """
    n = images.shape[0]
    assert batch_size % n_devices == 0
    sharding = mesh_lib.batch_sharding(mesh, fold_model=True) if mesh else None

    def put(start):
        chunk = images[start:start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.tile(chunk[-1:],
                                (pad,) + (1,) * (chunk.ndim - 1))], axis=0)
        dev = put_global_batch(sharding, chunk)
        return dev, pad

    starts = list(range(0, n, batch_size))
    out = []
    pending = None  # (future feats, pad)
    next_dev = put(starts[0]) if starts else None
    for i, start in enumerate(starts):
        dev, pad = next_dev
        feats = extract_fn(params, state, dev)  # async dispatch
        if i + 1 < len(starts):
            next_dev = put(starts[i + 1])       # overlap H2D with compute
        if pending is not None:
            pf, ppad = pending
            out.append(fetch_global(pf)[:batch_size - ppad])
        pending = (feats, pad)
    if pending is not None:
        pf, ppad = pending
        out.append(fetch_global(pf)[:batch_size - ppad])
    return np.concatenate(out, axis=0) if out else np.zeros((0,))
