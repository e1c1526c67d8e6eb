"""Checkpoint I/O: reference-pkl-compatible save/load + auto-resume.

Interoperates bidirectionally with the reference checkpoint container
(/root/reference/detectron/utils/net.py:53-178): a pickle of
``{'blobs': {unscoped_name: ndarray}, 'cfg': yaml_str}`` holding params,
BN running stats (``*_bn_rm`` / ``*_bn_riv`` — the latter stores plain
variance, see reference tools/pickle_caffe_blobs_keep_bn.py:140-158) and
``*_momentum`` blobs.

Our in-memory layout differs TPU-side (HWIO conv kernels, stacked [R, ...]
head params); this module owns the name/layout mapping:

  conv weights       OIHW <-> HWIO transpose
  head combo params  '{combo_prefix}_conv_w' [D,C,1,1] <-> stacked [R][C,D]
  FC weights         [K, D] <-> [D, K] (stacked [R, D, K] per combo)

so a checkpoint written here can be loaded by the reference and vice versa
(including the ImageNet R-50_BN.pkl bootstrap, which contains only backbone
blobs: partial loads are allowed exactly like the reference's name-matched,
shape-checked loader).
"""

import logging
import os
import re

import numpy as np
import jax.numpy as jnp
import yaml

from pps_tpu.utils.io import load_object, save_object

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# name/layout mapping between our pytrees and reference blob dicts
# ---------------------------------------------------------------------------


def _head_entries(model):
    """Yield (stacked_key, combo_idx, c2_name, kind) for head params."""
    prefix = model.head_param_prefix
    use_gn = model.head_spec.get('use_gn')
    for r, (combo_prefix, _) in enumerate(model.head_spec['combos']):
        yield prefix + '_conv_w', r, combo_prefix + '_conv_w', 'conv1x1_w'
        yield prefix + '_conv_b', r, combo_prefix + '_conv_b', 'vec'
        if use_gn:  # ConvGN variant (reference reid_heads.py:61-74)
            yield prefix + '_gn_s', r, combo_prefix + '_gn_s', 'vec'
            yield prefix + '_gn_b', r, combo_prefix + '_gn_b', 'vec'
        else:
            yield prefix + '_bn_s', r, combo_prefix + '_bn_s', 'vec'
            yield prefix + '_bn_b', r, combo_prefix + '_bn_b', 'vec'
        yield prefix + '_fc_w', r, combo_prefix + '_fc_w', 'fc_w'
        yield prefix + '_fc_b', r, combo_prefix + '_fc_b', 'vec'


def _head_state_entries(model):
    # ConvGN heads carry no running stats — reference checkpoints for
    # those have no rm/riv (the non-GN head always has real SpatialBN
    # stats regardless of MODEL.USE_BN, reid_heads.py:58)
    if model.head_spec.get('use_gn'):
        return
    prefix = model.head_param_prefix
    for r, (combo_prefix, _) in enumerate(model.head_spec['combos']):
        yield prefix + '_bn_rm', r, combo_prefix + '_bn_rm', 'vec'
        yield prefix + '_bn_riv', r, combo_prefix + '_bn_riv', 'vec'


def params_to_blobs(model, params, state=None):
    """Convert our (params[, state]) pytrees to a reference blob dict."""
    blobs = {}
    head_keys = {k for k, _, _, _ in _head_entries(model)}
    for name, arr in params.items():
        a = np.asarray(arr, dtype=np.float32)
        if name in head_keys:
            continue  # handled stacked below
        if name == 'crm_fc8c_w' or name == 'crm_fc8d_w':
            blobs[name] = np.ascontiguousarray(a.T)  # [D,K] -> [K,D]
        elif name.endswith('_w') and a.ndim == 4:
            blobs[name] = np.ascontiguousarray(
                a.transpose(3, 2, 0, 1))  # HWIO -> OIHW
        elif (name.endswith('_w') and a.ndim == 2
              and name.startswith('fpn_')):
            # FPN 1x1 convs are [C_in, C_out] einsum weights here; the
            # reference stores them as [C_out, C_in, 1, 1] conv blobs
            blobs[name] = np.ascontiguousarray(a.T)[:, :, None, None]
        else:
            blobs[name] = a
    for key, r, c2_name, kind in _head_entries(model):
        a = np.asarray(params[key][r], dtype=np.float32)
        blobs[c2_name] = _stacked_to_c2(a, kind)
    if state is not None:
        head_state_keys = {k for k, _, _, _ in _head_state_entries(model)}
        for name, arr in state.items():
            if name in head_state_keys:
                continue
            blobs[name] = np.asarray(arr, dtype=np.float32)
        for key, r, c2_name, kind in _head_state_entries(model):
            blobs[c2_name] = np.asarray(state[key][r], dtype=np.float32)
    return blobs


def _stacked_to_c2(a, kind):
    if kind == 'conv1x1_w':  # ours [C, D] -> c2 [D, C, 1, 1]
        return np.ascontiguousarray(a.T)[:, :, None, None]
    if kind == 'fc_w':  # ours [D, K] -> c2 [K, D]
        return np.ascontiguousarray(a.T)
    return a


def _c2_to_stacked(a, kind):
    if kind == 'conv1x1_w':
        return np.ascontiguousarray(a[:, :, 0, 0].T)
    if kind == 'fc_w':
        return np.ascontiguousarray(a.T)
    return a


def blobs_to_params(model, blobs, params, state):
    """Load a reference blob dict into copies of (params, state).

    Name-matched and shape-checked like the reference loader
    (utils/net.py:53-135); missing blobs keep their current values, unknown
    blobs are ignored with a log line.  Returns (params, state, matched).
    """
    params = dict(params)
    state = dict(state)
    matched = set()

    def _try_set(tree, name, value):
        cur = tree[name]
        if tuple(cur.shape) != tuple(value.shape):
            raise ValueError(
                'Shape mismatch for {}: checkpoint {} vs model {}'.format(
                    name, value.shape, cur.shape))
        tree[name] = jnp.asarray(value, dtype=jnp.float32)

    head = {c2: (key, r, kind) for key, r, c2, kind in _head_entries(model)}
    head_state = {
        c2: (key, r, kind) for key, r, c2, kind in _head_state_entries(model)}

    # stacked head params are assembled then written once
    stacked_new = {}
    for c2_name, arr in blobs.items():
        arr = np.asarray(arr, dtype=np.float32)
        if c2_name in head:
            key, r, kind = head[c2_name]
            stacked_new.setdefault(key, np.asarray(params[key]).copy())
            stacked_new[key][r] = _c2_to_stacked(arr, kind)
            matched.add(c2_name)
        elif c2_name in head_state:
            key, r, kind = head_state[c2_name]
            stacked_new.setdefault(key, np.asarray(state[key]).copy())
            stacked_new[key][r] = arr
            matched.add(c2_name)
        elif c2_name in ('crm_fc8c_w', 'crm_fc8d_w') and c2_name in params:
            _try_set(params, c2_name, arr.T)
            matched.add(c2_name)
        elif c2_name in params:
            p = np.asarray(params[c2_name])
            if p.ndim == 4 and c2_name.endswith('_w'):
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            elif (p.ndim == 2 and arr.ndim == 4
                  and c2_name.endswith('_w')
                  and c2_name.startswith('fpn_')):
                arr = arr[:, :, 0, 0].T  # [C_out,C_in,1,1] -> [C_in,C_out]
            _try_set(params, c2_name, arr)
            matched.add(c2_name)
        elif c2_name in state:
            _try_set(state, c2_name, arr)
            matched.add(c2_name)
        elif c2_name.endswith('_momentum'):
            pass  # handled by load_checkpoint
        else:
            logger.info('Ignoring checkpoint blob with no model match: %s',
                        c2_name)
    for key, arr in stacked_new.items():
        if key in params:
            params[key] = jnp.asarray(arr)
        else:
            state[key] = jnp.asarray(arr)
    return params, state, matched


# ---------------------------------------------------------------------------
# save / load / resume
# ---------------------------------------------------------------------------


_PKL_SYNC = [0]

# mesh -> jitted identity with replicated out_shardings, reused across
# saves so repeated checkpoints hit the jit fast path instead of
# retracing (see _replicate_for_host).
_GATHER_JITS = {}


def _replicate_for_host(tree):
    """Re-commit every jax leaf to a fully-replicated sharding so the
    host fetch in params_to_blobs works on every process (multi-host:
    an XLA all-gather — a COLLECTIVE, so all processes must call
    together from the main thread).  No-op single-process.

    All leaves sharing a mesh go through ONE jitted identity call (a
    single sharding is a valid out_shardings prefix for the whole list),
    so a save compiles one gather program per mesh — not one tiny XLA
    program per parameter leaf, which on a slow remote compile service
    turns a checkpoint into minutes of compile stalls."""
    import jax

    if jax.process_count() == 1 or tree is None:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec as P

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    by_mesh = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array) and hasattr(x.sharding, 'mesh'):
            by_mesh.setdefault(x.sharding.mesh, []).append(i)
    for mesh, idxs in by_mesh.items():
        gather = _GATHER_JITS.get(mesh)
        if gather is None:
            rep = NamedSharding(mesh, P())
            gather = _GATHER_JITS[mesh] = jax.jit(
                lambda xs: xs, out_shardings=rep)
        fixed = gather([leaves[i] for i in idxs])
        for i, x in zip(idxs, fixed):
            leaves[i] = x
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path, model, params, state, opt_state=None, cfg=None):
    """Write a reference-compatible weights pickle
    (reference utils/net.py:138-178 content contract).

    Multi-host: every process must call this together FROM THE MAIN
    THREAD (process-sharded leaves are all-gathered first); process 0
    writes the file and everyone barriers on completion, so a process
    returning from here may rely on the file existing."""
    import jax

    multi = jax.process_count() > 1
    if multi:
        params = _replicate_for_host(params)
        state = _replicate_for_host(state)
        opt_state = _replicate_for_host(opt_state)
    if not multi or jax.process_index() == 0:
        blobs = params_to_blobs(model, params, state)
        if opt_state is not None and 'momentum' in opt_state:
            mom_blobs = params_to_blobs(model, opt_state['momentum'])
            for name, arr in mom_blobs.items():
                blobs[name + '_momentum'] = arr
        # re-emit blobs preserved at load (reference utils/net.py:122-178
        # '__preserve__/' namescope): a weights file that transits this
        # trainer keeps blobs the model doesn't use, so load->save is
        # lossless for downstream reference consumers.  Live model blobs
        # take precedence on a name collision, as in the reference save.
        preserved = getattr(model, '_preserved_blobs', {})
        n_pres = 0
        for name, arr in preserved.items():
            if name not in blobs:
                blobs[name] = arr
                n_pres += 1
        if n_pres:
            logger.info('Re-emitting %d preserved (model-unused) blobs',
                        n_pres)
        payload = {'blobs': blobs}
        if cfg is not None:
            payload['cfg'] = yaml.dump(_plain(dict(cfg)))
        save_object(payload, path)
        logger.info('Wrote checkpoint: %s (%d blobs)', path, len(blobs))
    if multi:
        from jax.experimental import multihost_utils
        _PKL_SYNC[0] += 1
        multihost_utils.sync_global_devices(
            'pps_ckpt_%d' % _PKL_SYNC[0])


def _plain(obj):
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def load_checkpoint(path, model, params, state, opt_state=None):
    """Load weights (+ momentum if opt_state given) from a pickle.

    Accepts both our checkpoints and reference ones (including the
    backbone-only ImageNet bootstrap).  Returns (params, state, opt_state).
    """
    payload = load_object(path)
    blobs = payload.get('blobs', payload)
    weight_blobs = {k: v for k, v in blobs.items()
                    if not k.endswith('_momentum')}
    params, state, matched = blobs_to_params(model, weight_blobs, params,
                                             state)
    logger.info('Loaded %d/%d checkpoint blobs from %s', len(matched),
                len(weight_blobs), path)
    # preserve unmatched blobs on the model (the workspace analog of the
    # reference's '__preserve__/' namescope, utils/net.py:122-135):
    # save_checkpoint re-emits them so the round-trip is lossless.
    # Momentum blobs are never preserved, as in the reference.
    preserved = {k: np.asarray(v) for k, v in weight_blobs.items()
                 if k not in matched and v is not None}
    if preserved:
        logger.info('Preserving %d blobs unused by the model '
                    '(re-emitted on save)', len(preserved))
    model._preserved_blobs = preserved
    if opt_state is not None:
        mom_blobs = {k[:-len('_momentum')]: v for k, v in blobs.items()
                     if k.endswith('_momentum')}
        if mom_blobs:
            mom, _, _ = blobs_to_params(
                model, mom_blobs, opt_state['momentum'],
                {})
            opt_state = dict(opt_state)
            opt_state['momentum'] = mom
    return params, state, opt_state


# ---------------------------------------------------------------------------
# orbax backend (TPU-native sharded checkpoints; TPU.CKPT_FORMAT = 'orbax')
# ---------------------------------------------------------------------------
#
# The pkl format above is the reference-interop contract (one host pickles
# one blob dict).  At production scale that is the wrong shape: every host
# would materialize the full f32 state, and writes block the device loop.
# The orbax backend saves the NATIVE pytree ({'params', 'state', 'opt'})
# with its device shardings — each host writes only its own shards
# (multi-host correct by construction), restores re-shard on load, and the
# pkl converter path (save/load_checkpoint) remains available for moving
# weights to/from the reference ecosystem.  Survey section 5 prescribed
# exactly this split ("orbax checkpoints + a pkl->jax converter").


def save_checkpoint_orbax(path, train_state, cfg=None):
    """Write {'params','state','opt'} to an orbax directory at `path`.

    The save is ASYNC (orbax streams D2H + disk in background threads);
    call `wait_for_orbax()` or save again (which waits on the previous
    write) before reading the directory.
    """
    import jax
    import orbax.checkpoint as ocp
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()  # one async write in flight at a time
    ckptr.save(os.path.abspath(path), dict(train_state), force=True)
    # sidecar from process 0 only (multi-host shares one fs; concurrent
    # writers would race), and only after the save above was accepted —
    # wait_for_orbax()/the next save confirms the directory itself.
    if cfg is not None and jax.process_index() == 0:
        with open(os.path.abspath(path) + '.cfg.yaml', 'w') as f:
            f.write(yaml.dump(_plain(dict(cfg))))
    logger.info('Writing orbax checkpoint: %s (async)', path)


def load_checkpoint_orbax(path, train_state=None):
    """Restore an orbax checkpoint.  With `train_state` (a real or
    abstract template matching the saved {'params','state','opt'}
    structure) the restore re-shards onto the template's placements;
    without one, the saved structure is restored as-is (single-host
    loads, e.g. eval picking just params/state).  Returns the tree."""
    import jax
    import orbax.checkpoint as ocp
    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()
    if train_state is None:
        out = ckptr.restore(os.path.abspath(path))
    else:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          dict(train_state))
        out = ckptr.restore(os.path.abspath(path), abstract)
    logger.info('Restored orbax checkpoint: %s', path)
    return out


_ORBAX_CKPTR = []


def _orbax_checkpointer():
    import orbax.checkpoint as ocp
    if not _ORBAX_CKPTR:
        _ORBAX_CKPTR.append(ocp.StandardCheckpointer())
    return _ORBAX_CKPTR[0]


def wait_for_orbax():
    """Block until any in-flight async orbax save has committed."""
    if _ORBAX_CKPTR:
        _ORBAX_CKPTR[0].wait_until_finished()


_EPOCH_RE = re.compile(r'^model_epoch(\d+)\.(pkl|orbax)$')
_PREEMPT_RE = re.compile(r'^model_preempt_epoch(\d+)_step(\d+)\.(pkl|orbax)$')


def find_resume_checkpoint(output_dir):
    """Auto-resume scan (reference utils/train.py:146-185): returns
    (path, epoch, step) of the furthest resume point.  ``model_epoch{N}``
    resumes at (N, 0); a mid-epoch ``model_preempt_epoch{E}_step{S}``
    (written by the SIGTERM preemption path after S steps of epoch E)
    resumes at (E, S) — the (epoch, step) tuple order IS the resume-
    position order.  ``model_final.pkl`` wins with epoch = -1 meaning
    training is complete."""
    final = os.path.join(output_dir, 'model_final.pkl')
    if os.path.exists(final):
        return final, -1, 0
    best = (None, 0, 0)
    if os.path.isdir(output_dir):
        for f in os.listdir(output_dir):
            m = _EPOCH_RE.match(f)
            key = (int(m.group(1)), 0) if m else None
            if key is None:
                m = _PREEMPT_RE.match(f)
                if m:
                    key = (int(m.group(1)), int(m.group(2)))
            if key is not None and key > best[1:]:
                best = (os.path.join(output_dir, f),) + key
    return best
