"""int8 post-training quantization for the serving path.

The MXU on v5e-class TPUs runs s8 x s8 -> s32 at ~2x the bf16 rate
(measured on this chip: conv 265.7 TOP/s vs 164.9 TFLOP/s bf16, dot
399.4 vs 225.0 — tools/bench_int8.py), so the extraction path can trade
<0.1% embedding fidelity for a large throughput win.  This is a
beyond-reference capability: the reference serves f32 through Caffe2
(/root/reference/tools/convert_pkl_to_pb.py is its deploy converter, no
quantized path exists).

Recipe (the standard PTQ design, mapped to XLA):

1. Fold BN into the convs (models/folding.py) so each body conv is
   ``y = conv(x, w') + fb``.
2. Calibrate: run a few hundred test images through the folded f32/bf16
   graph with ``spec['calibrate']`` set; ``_conv_bn`` records the absmax
   of every conv input through the ``updates`` thread.
3. Quantize: per-OUTPUT-CHANNEL symmetric int8 weights
   (``s_w[c] = absmax(w'[..., c]) / 127``) and per-tensor symmetric
   static input scales (``s_x = amax / 127``).  The serving graph
   (resnet.conv2d_int8) quantizes activations inline
   (``round(x / s_x)``, fused by XLA into the previous op's epilogue),
   convolves in int8 with int32 accumulation, and dequantizes through
   the folded-bias epilogue: ``y = s32 * (s_x * s_w[c]) + fb``.

Only the conv body is quantized (conv1 + res2..res5 — where ~99% of the
extraction FLOPs are); FPN laterals and the embedding head stay in
bf16/f32 for embedding fidelity.  Training is untouched.

GroupNorm bodies (MODEL.USE_GN) quantize too — GN is input-dependent so
nothing folds; the quantized conv carries fb=0 and GN runs on the
dequantized output.  Their activations have a wide CROSS-channel range
(per-channel gammas), so they use per-INPUT-channel activation scales
folded exactly into the weights before quantization
(w''[..., c, o] = w[..., c, o] * s_c, activations quantize as
round(x_c / s_c) — a broadcast multiply, same VPU cost as the scalar):
measured on the tiny GN model, per-tensor scales cost 7% embedding
cosine where per-channel is exact to 1e-5 (tests/test_quantize.py).
BN-folded bodies keep the single per-tensor input scale (the fold
already equalizes channels; ~0.1%/layer measured).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.models import resnet as resnet_lib
from pps_tpu.models.folding import fold_conv_bn


def _is_body_conv(base, params, use_gn=False):
    w = params.get(base + '_w')
    if w is None or w.ndim != 4:
        return False
    if not (base == 'conv1' or base.startswith('res')):
        return False
    if use_gn:
        # GN isn't foldable (input-dependent stats): the quantized conv
        # carries fb=0 and GN runs on the dequantized output
        return (base + '_gn_s') in params
    return (base + '_fb') in params


def calibrate_amax(folded_params, state, spec, image_batches):
    """Per-conv input absmax over calibration batches.

    folded_params must be BN-folded (fold_conv_bn) so the capture runs
    the same eval graph the quantized model will replace.  Returns
    {conv_base_name: float amax}.
    """
    spec_c = dict(spec, calibrate=True)

    @jax.jit
    def capture(params, state, x):
        out = resnet_lib.apply_resnet(params, state, x, spec_c, train=False)
        upd = out[-1]
        return {k: v for k, v in upd.items() if k.startswith('__amax__')}

    amax = {}
    for x in image_batches:
        rec = jax.device_get(capture(folded_params, state, jnp.asarray(x)))
        for k, v in rec.items():
            name = k[len('__amax__'):]
            v = np.asarray(v, np.float32)  # per-input-channel vector
            amax[name] = np.maximum(amax.get(name, 0.0), v)
    return amax


def quantize_body(folded_params, amax, use_gn=False):
    """Folded params -> int8-quantized body params.

    For every body conv ``base``: replaces ``base_w`` with
      base_wq   int8 HWIO weights (per-output-channel symmetric)
      base_xinv f32 scalar, 1 / input_scale
      base_osc  f32 [C_out], input_scale * w_scale[c] (dequant factor)
    keeping ``base_fb`` (synthesized as zeros for GN bodies, where the
    norm stays a separate op after the conv).  Raises if a body conv has
    no calibration record (a silently-unquantized layer would corrupt
    the perf story).
    """
    q = dict(folded_params)
    n_quantized = 0
    for name in list(folded_params):
        if not name.endswith('_w'):
            continue
        base = name[:-2]
        if not _is_body_conv(base, folded_params, use_gn=use_gn):
            continue
        if base not in amax:
            raise KeyError(
                'no calibration record for body conv {!r}; run '
                'calibrate_amax over at least one batch first'.format(base))
        w = np.asarray(folded_params[name], np.float32)
        amax_c = np.atleast_1d(np.asarray(amax[base], np.float32))
        if use_gn:
            # Per-INPUT-channel activation scales: GN-normalized
            # activations have a wide CROSS-channel range (the per-
            # channel gammas), so one per-tensor scale wastes most of
            # the int8 grid on the widest channel.  x_c = s_c * q_c
            # folds exactly into the weights BEFORE quantization
            # (w''[..., c, o] = w[..., c, o] * s_c), leaving the usual
            # per-output-channel dequant: y_o = s_w''[o] * s32_o.
            s_c = np.maximum(amax_c, 1e-12) / 127.0
            cin, i_w = s_c.size, w.shape[2]
            g = cin // i_w  # grouped conv (ResNeXt): block-diag absorb
            opg = w.shape[3] // g
            # factor[i, o] = s_c[(o // opg) * i_w + i]
            factor = np.repeat(s_c.reshape(g, i_w).T, opg, axis=1)
            w = w * factor[None, None]
            s_w = np.maximum(
                np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
            wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
            q[base + '_xinv'] = jnp.asarray(
                (1.0 / s_c).astype(np.float32))
            q[base + '_osc'] = jnp.asarray(s_w.astype(np.float32))
        else:
            # BN-folded body: one static input scale (the fold already
            # equalizes channels well; measured ~0.1%/layer error)
            s_x = max(float(amax_c.max()), 1e-12) / 127.0
            s_w = np.maximum(
                np.max(np.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12)
            wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int8)
            q[base + '_xinv'] = jnp.float32(1.0 / s_x)
            q[base + '_osc'] = jnp.asarray((s_w * s_x).astype(np.float32))
        q[base + '_wq'] = jnp.asarray(wq)
        if (base + '_fb') not in q:  # GN body: bias-free quantized conv
            q[base + '_fb'] = jnp.zeros((w.shape[-1],), jnp.float32)
        del q[name]
        n_quantized += 1
    assert n_quantized, 'no body convs found to quantize'
    return q


def quantize_for_eval(model, params, state, calib_images, batch_size=64):
    """One-call PTQ: fold + calibrate + quantize the conv body.

    calib_images: [N, H, W, 3] preprocessed (mean-subtracted BGR) stack —
    a few hundred test images is plenty for absmax calibration.
    Returns the quantized params dict, ready for model.extract_features
    (the int8 path is auto-detected from the ``_wq`` keys).
    """
    folded = fold_conv_bn(params, state)
    calib_images = np.asarray(calib_images)
    batches = [calib_images[i:i + batch_size]
               for i in range(0, len(calib_images), batch_size)]
    # pad the tail so one graph serves all calibration batches
    if len(batches) > 1 and len(batches[-1]) != batch_size:
        batches[-1] = calib_images[-batch_size:]
    use_gn = bool(model.resnet_spec.get('use_gn'))
    amax = calibrate_amax(folded, state, model.resnet_spec, batches)
    return quantize_body(folded, amax, use_gn=use_gn)
