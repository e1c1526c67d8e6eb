"""Part heads: BPM strips, PPS power-set, Youtu pyramid + re-ID embedding/CRM.

TPU-native redesign of the reference head builders:

* reference bpm_heads.py:18-103  — uniform strip partition + ave/max pools
* reference pps_heads.py:38-142  — all 2^n-1 strip combinations ("the" head)
* reference youtu_heads.py:18-67 — coarse-to-fine contiguous-window pyramid
* reference reid_heads.py:34-188 — per-combo 1x1 conv + BN + ReLU + FC
* reference crm_heads.py:23-139  — combination-ranking two-softmax attention

Instead of emitting one named blob per combination (31 graph branches in the
reference), every combination is an index in a stacked ``[R, ...]`` axis and
the per-combo 1x1 convs / FCs become single batched einsums — one big MXU
matmul each instead of 31 tiny ones.  Combination order is exactly the
reference's bitmask enumeration (pps_heads.py:47-52), so the concatenated
test-time embedding layout is bit-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.models.resnet import BN_EPSILON, BN_MOMENTUM


# ---------------------------------------------------------------------------
# Static head specification
# ---------------------------------------------------------------------------


def strip_splits(strip_num, scale_h, spatial_scale):
    """Per-strip row counts for the feature map.

    Replicates the hand-tuned uneven split tables for (strip_num, input
    height 384) of reference bpm_heads.py:25-43; otherwise uniform
    ``int(H_feat / strip_num)`` rows per strip.
    """
    tables = {7: [3, 3, 4, 4, 4, 3, 3],
              5: [5, 5, 4, 5, 5],
              9: [2, 3, 3, 3, 3, 3, 3, 2, 2],
              10: [2, 2, 2, 3, 3, 3, 3, 2, 2, 2]}
    if strip_num in tables and scale_h == 16 * 24:
        scale = 16 * spatial_scale
        return [int(s * scale) for s in tables[strip_num]]
    strip_h = int(scale_h * spatial_scale / strip_num)
    return [strip_h for _ in range(strip_num)]


def powerset_combos(strip_num, preprefix='pps'):
    """All non-empty strip subsets in the reference's bitmask order
    (pps_heads.py:47-64): index i in 1..2^n-1, bit j set => strip j."""
    combos = []
    for i in range(1, 1 << strip_num):
        members = tuple(j for j in range(strip_num) if i & (1 << j))
        prefix = preprefix + ''.join(str(c) for c in members)
        combos.append((prefix, members))
    return combos


def bpm_combos(strip_num, preprefix='bpm'):
    """One single-strip 'combination' per strip (bpm_heads.py:67-77)."""
    return [(preprefix + str(i), (i,)) for i in range(strip_num)]


def youtu_combos(strip_num, preprefix='youtu'):
    """All contiguous strip windows, coarse-to-fine: for level s = n..1 the
    window covers n-s+1 strips at each of s positions (youtu_heads.py:30-62).
    Prefix matches the reference blob naming youtu{s}{i}."""
    combos = []
    for s in range(strip_num, 0, -1):
        k = strip_num - s + 1
        for i in range(s):
            combos.append((preprefix + str(s) + str(i),
                           tuple(range(i, i + k))))
    return combos


def head_spec(cfg, spatial_scale, fpn_level=None):
    """Build the static head description from cfg.

    Returns a dict with: kind, strip_num, splits, combos
    [(prefix, members)], mode, bpm_dim, num_logits, dropout.
    """
    name = cfg.FAST_RCNN.ROI_BOX_HEAD
    strip_num = cfg.REID.BPM_STRIP_NUM
    scale_h = cfg.REID.SCALE[1]
    level_tag = '' if fpn_level is None else '_{}_'.format(fpn_level)

    if 'pps' in name:
        kind = 'pps'
        combos = powerset_combos(strip_num, 'pps' + level_tag)
        mode = 'mean_max' if cfg.REID.MAX_AVE_FEATURE else 'max'
    elif 'youtu' in name:
        kind = 'youtu'
        combos = youtu_combos(strip_num, 'youtu' + level_tag)
        mode = 'mean_max'  # youtu always sums ave+max (youtu_heads.py:49)
    elif 'bpm' in name or 'uniform' in name:
        kind = 'bpm'
        combos = bpm_combos(strip_num, 'bpm' + level_tag)
        mode = 'mean_max' if cfg.REID.MAX_AVE_FEATURE else 'ave'
    else:
        raise ValueError('Unknown ROI_BOX_HEAD: {}'.format(name))

    splits = strip_splits(strip_num, scale_h, spatial_scale)
    return {
        'kind': kind,
        'strip_num': strip_num,
        'splits': splits,
        'combos': combos,
        'mode': mode,
        'bpm_dim': cfg.REID.BPM_DIM,
        'num_logits': cfg.MODEL.NUM_CLASSES - 1,
        'dropout': 0.2 if cfg.REID.DROPOUT_FEATURE else 0.0,
        'normalize_feature': cfg.REID.NORMALIZE_FEATURE,
        'crm': cfg.REID.CRM,
        # ConvGN head variant (reference reid_heads.py:61-74 USE_GN branch).
        # NOTE: MODEL.USE_BN does NOT reach the head — the reference head
        # calls model.SpatialBN directly (reid_heads.py:58), not the
        # USE_BN-gated AffineChannel helper (detector.py:82-109), so the
        # non-GN head always carries real batch norm with running stats.
        'use_gn': cfg.MODEL.USE_GN,
        'gn_groups': (_get_group_gn(cfg, cfg.REID.BPM_DIM)
                      if cfg.MODEL.USE_GN else 0),
        'gn_eps': cfg.GROUP_NORM.EPSILON,
    }


def _get_group_gn(cfg, dim):
    """Number of GroupNorm groups for `dim` channels
    (reference utils/net.py:291-305; shared impl in models/resnet.py)."""
    from pps_tpu.models.resnet import get_group_gn
    return get_group_gn(dim, cfg.GROUP_NORM.DIM_PER_GP,
                        cfg.GROUP_NORM.NUM_GROUPS)


def combo_masks(spec):
    """[R, n] float mask of strip membership per combination."""
    n = spec['strip_num']
    m = np.zeros((len(spec['combos']), n), dtype=np.float32)
    for r, (_, members) in enumerate(spec['combos']):
        for j in members:
            m[r, j] = 1.0
    return jnp.asarray(m)


# ---------------------------------------------------------------------------
# Strip pooling + combination features
# ---------------------------------------------------------------------------


def strip_pools(feat, splits):
    """Split [B, H, W, C] into strips along H; global ave+max pool each.

    Returns (ave, mx): both [B, n, C].  Mirrors bpm_heads.py:44-55 but the
    strips stay a stacked axis instead of n named blobs.
    """
    aves, maxs = [], []
    start = 0
    for rows in splits:
        s = feat[:, start:start + rows]
        aves.append(jnp.mean(s, axis=(1, 2)))
        maxs.append(jnp.max(s, axis=(1, 2)))
        start += rows
    return jnp.stack(aves, axis=1), jnp.stack(maxs, axis=1)


def combine_strips(ave, mx, masks, mode):
    """Per-combination features [B, R, C] from per-strip pools [B, n, C].

    mode 'mean_max': Mean(member aves) + Max(member maxes)
                     (pps_heads.py:58-68 / bpm Add of ave+max pools)
    mode 'max':      Max(member ave-pools)      (pps_heads.py:70-76)
    mode 'ave':      the single member ave-pool (bpm_heads.py:55)
    """
    neg_inf = jnp.finfo(ave.dtype).min
    counts = jnp.sum(masks, axis=1)  # [R]
    mean_of_ave = jnp.einsum(
        'rn,bnc->brc', masks, ave,
        preferred_element_type=jnp.float32) / counts[None, :, None]
    if mode == 'mean_max':
        masked_max = jnp.max(
            jnp.where(masks[None, :, :, None] > 0, mx[:, None, :, :],
                      neg_inf), axis=2)
        return mean_of_ave + masked_max
    elif mode == 'max':
        masked_ave_max = jnp.max(
            jnp.where(masks[None, :, :, None] > 0, ave[:, None, :, :],
                      neg_inf), axis=2)
        return masked_ave_max
    elif mode == 'ave':
        return mean_of_ave
    raise ValueError(mode)


# ---------------------------------------------------------------------------
# Re-ID embedding head (per-combo 1x1 conv + BN + ReLU [+ dropout] + FC)
# ---------------------------------------------------------------------------


def init_head_params(rng, spec, dim_in, param_prefix='reid'):
    """Stacked head params.

    Caffe2 equivalents per combo prefix p (reference reid_heads.py:42-93):
      {p}_conv_w [D, C, 1, 1] (MSRAFill), {p}_conv_b [D] (0)
      {p}_bn_s/_b [D] + running stats
      {p}_fc_w [K, D] (gauss 0.001), {p}_fc_b [K] (0)
    Stored stacked: {prefix}_conv_w [R, C, D] etc.
    """
    r = len(spec['combos'])
    d = spec['bpm_dim']
    k = spec['num_logits']
    k1, k2 = jax.random.split(rng)
    # MSRAFill for a [D, C, 1, 1] conv: fan_out = D (kh*kw*out)
    std = np.sqrt(2.0 / d)
    params = {
        param_prefix + '_conv_w':
            jax.random.normal(k1, (r, dim_in, d), jnp.float32) * std,
        param_prefix + '_conv_b': jnp.zeros((r, d), jnp.float32),
        param_prefix + '_fc_w':
            jax.random.normal(k2, (r, d, k), jnp.float32) * 0.001,
        param_prefix + '_fc_b': jnp.zeros((r, k), jnp.float32),
    }
    state = {}
    if spec.get('use_gn'):
        params[param_prefix + '_gn_s'] = jnp.ones((r, d), jnp.float32)
        params[param_prefix + '_gn_b'] = jnp.zeros((r, d), jnp.float32)
    else:
        params[param_prefix + '_bn_s'] = jnp.ones((r, d), jnp.float32)
        params[param_prefix + '_bn_b'] = jnp.zeros((r, d), jnp.float32)
        state[param_prefix + '_bn_rm'] = jnp.zeros((r, d), jnp.float32)
        state[param_prefix + '_bn_riv'] = jnp.ones((r, d), jnp.float32)
    return params, state


def apply_head(params, state, combo_feats, spec, train=False,
               dropout_rng=None, param_prefix='reid'):
    """Run the stacked embedding head.

    Args:
      combo_feats: [B, R, C] combination features.
    Returns:
      (features [B, R, D] post-ReLU, logits [B, R, K], state_updates)
    """
    p = param_prefix
    x = jnp.einsum('brc,rcd->brd', combo_feats, params[p + '_conv_w'],
                   preferred_element_type=jnp.float32)
    x = x + params[p + '_conv_b'][None]

    if spec.get('use_gn'):
        # GroupNorm over D per (sample, combo) — no batch statistics
        # (reference ConvGN, reid_heads.py:61-74)
        bsz, r, d = x.shape
        g = spec['gn_groups']
        xg = x.reshape(bsz, r, g, d // g)
        mean = jnp.mean(xg, axis=3, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=3, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + spec['gn_eps'])
        x = xg.reshape(bsz, r, d)
        x = x * params[p + '_gn_s'][None] + params[p + '_gn_b'][None]
        features = jax.nn.relu(x)
        updates = {}
        return _head_fc(params, features, spec, train, dropout_rng, p,
                        updates)

    # SpatialBN on [B, D, 1, 1] per combo: batch stats over axis 0 only
    # (always real BN — reid_heads.py:58 bypasses the USE_BN gate)
    s, b = params[p + '_bn_s'], params[p + '_bn_b']
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.maximum(jnp.mean(jnp.square(x), axis=0) - jnp.square(mean),
                          0.0)
        updates = {
            p + '_bn_rm': BN_MOMENTUM * state[p + '_bn_rm'] +
            (1 - BN_MOMENTUM) * mean,
            p + '_bn_riv': BN_MOMENTUM * state[p + '_bn_riv'] +
            (1 - BN_MOMENTUM) * var,
        }
    else:
        mean, var = state[p + '_bn_rm'], state[p + '_bn_riv']
        updates = {}
    x = (x - mean) * (jax.lax.rsqrt(var + BN_EPSILON) * s) + b

    features = jax.nn.relu(x)
    return _head_fc(params, features, spec, train, dropout_rng, p, updates)


def _head_fc(params, features, spec, train, dropout_rng, p, updates):
    """Dropout + per-combo FC classifier (reference reid_heads.py:81-90)."""
    fc_in = features
    if train and spec['dropout'] > 0.0:
        assert dropout_rng is not None, 'dropout needs an rng in train mode'
        keep = 1.0 - spec['dropout']
        mask = jax.random.bernoulli(dropout_rng, keep, features.shape)
        fc_in = jnp.where(mask, features / keep, 0.0)

    logits = jnp.einsum('brd,rdk->brk', fc_in, params[p + '_fc_w'],
                        preferred_element_type=jnp.float32)
    logits = logits + params[p + '_fc_b'][None]
    return features, logits, updates


def test_embedding(features, normalize=True):
    """Concat per-combo features to the final embedding [B, R*D], optionally
    L2-normalized (reference reid_heads.py:95-127; combo order preserved)."""
    b = features.shape[0]
    emb = features.reshape(b, -1)
    if normalize:
        norm = jnp.sqrt(jnp.sum(jnp.square(emb), axis=1, keepdims=True))
        emb = emb / jnp.maximum(norm, 1e-12)
    return emb


# ---------------------------------------------------------------------------
# CRM: combination ranking module
# ---------------------------------------------------------------------------


def init_crm_params(rng, spec, param_prefix='crm'):
    """crm_fc8c / crm_fc8d: [D, K] XavierFill + zero bias
    (reference crm_heads.py:44-57)."""
    d = spec['bpm_dim']
    k = spec['num_logits']
    k1, k2 = jax.random.split(rng)
    # Caffe2 XavierFill: uniform(-sqrt(3/fan_in), sqrt(3/fan_in))
    lim = np.sqrt(3.0 / d)
    return {
        param_prefix + '_fc8c_w':
            jax.random.uniform(k1, (d, k), jnp.float32, -lim, lim),
        param_prefix + '_fc8c_b': jnp.zeros((k,), jnp.float32),
        param_prefix + '_fc8d_w':
            jax.random.uniform(k2, (d, k), jnp.float32, -lim, lim),
        param_prefix + '_fc8d_b': jnp.zeros((k,), jnp.float32),
    }


def apply_crm(params, features, param_prefix='crm'):
    """Two-branch soft attention over combinations
    (reference crm_heads.py:23-74).

    features: [B, R, D] (pre-dropout post-ReLU combo features).
    Returns probs [B, K]: per-class image-level probability in [0, 1].
    """
    p = param_prefix
    fc8c = jnp.einsum('brd,dk->brk', features, params[p + '_fc8c_w'],
                      preferred_element_type=jnp.float32)
    fc8c = fc8c + params[p + '_fc8c_b']
    fc8d = jnp.einsum('brd,dk->brk', features, params[p + '_fc8d_w'],
                      preferred_element_type=jnp.float32)
    fc8d = fc8d + params[p + '_fc8d_b']

    alpha_cls = jax.nn.softmax(fc8c, axis=2)  # over classes per (b, combo)
    alpha_det = jax.nn.softmax(fc8d, axis=1)  # over combos per (b, class)
    rois_pred = alpha_cls * alpha_det
    return jnp.sum(rois_pred, axis=1)
