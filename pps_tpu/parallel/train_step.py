"""The jitted, mesh-sharded training step.

One step = the reference's entire per-iteration C2 DAG (dequeue -> fwd ->
bwd -> allreduce -> SGD, reference utils/train.py:86 RunNet) expressed as a
single pure function jit-compiled over a device mesh.  Workspace-fed scalars
(`lr`, `loss_scale_factor` — reference detector.py:500-537,
triplet_loss.py:160-171) become traced array arguments so LR changes and the
triplet epoch alternation never trigger recompilation.

Gradient semantics: the loss is the *global*-batch loss, so with the batch
sharded over 'data' the gradient allreduce is inserted by XLA (GSPMD), and
no explicit 1/NUM_GPUS loss scale is needed (the reference's
GetLossScale=1/N at detector.py:561-566 served exactly this purpose).

BatchNorm note: batch statistics are computed over the global batch
(sync-BN) rather than per-replica as in the reference.  For the shipped
1-GPU flagship configs this is bit-identical; for multi-device it is the
strictly-more-correct TPU-native choice.
"""

import functools

import jax
import jax.numpy as jnp

from pps_tpu.parallel import mesh as mesh_lib
from pps_tpu.solver import optimizer as opt_lib


def make_train_step(model, cfg, mesh, meta=None, trainable=None,
                    donate=None):
    """Build the jitted train step.

    Returns step(train_state, batch, lr, loss_scale_factor, rng)
      -> (train_state, logs)
    where train_state = {'params', 'state', 'opt'} and
    batch = {'data' [B,H,W,3] f32, 'labels_int32' [B], 'labels_oh' [B,C]}.
    """
    flavor = opt_lib.flavor_from_cfg(cfg)
    iter_size = int(cfg.REID.ITER_SIZE)
    momentum = float(cfg.SOLVER.MOMENTUM)
    if donate is None:
        donate = bool(cfg.TPU.DONATE)
    from pps_tpu.data import device_augment as aug_lib
    aug_spec = aug_lib.augment_spec(cfg)
    import numpy as np
    pixel_means = np.asarray(cfg.PIXEL_MEANS)

    def step(train_state, batch, lr, loss_scale_factor, rng):
        params, state, opt_state = (train_state['params'],
                                    train_state['state'],
                                    train_state['opt'])
        if 'data_u8' in batch:
            # on-device input pipeline: flip + augment + mean-sub + bicubic
            # resize fused into the step graph (uint8 wire); the augment
            # PRNG is keyed off the step rng so replays are deterministic
            rng, aug_rng = jax.random.split(rng)
            data = aug_lib.augment_batch(aug_rng, batch['data_u8'],
                                         batch['flipped'], aug_spec,
                                         pixel_means,
                                         valid_hw=batch.get('valid_hw'))
            batch = {'data': data,
                     'labels_int32': batch['labels_int32'],
                     'labels_oh': batch['labels_oh']}
        grad_fn = jax.value_and_grad(model.train_forward, has_aux=True)
        (_, (updates, logs)), grads = grad_fn(
            params, state, batch, rng, loss_scale_factor)
        new_state = dict(state)
        new_state.update(updates)
        new_params, new_opt = opt_lib.sgd_update(
            params, grads, opt_state, lr, meta, momentum=momentum,
            flavor=flavor, iter_size=iter_size, num_devices=1,
            trainable=trainable)
        logs['lr'] = lr
        return ({'params': new_params, 'state': new_state, 'opt': new_opt},
                logs)

    if meta is None:
        # late-bound: caller passes params first to compute meta
        def build(params):
            m = opt_lib.make_param_meta(params, cfg)
            return make_train_step(model, cfg, mesh, meta=m,
                                   trainable=trainable, donate=donate)
        return build

    # Shardings are committed by *placement* (place_train_state /
    # shard_batch put the arrays with NamedShardings once) and the jit
    # infers the rest.  Explicit in/out_shardings pytrees are deliberately
    # avoided: with ~900 output leaves they force a per-buffer resharding
    # path on single-chip PJRT plugins that costs ~100x the step itself
    # (measured 3.2s vs 36ms on TPU v5e via axon).
    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    jitted.raw_step = step
    return jitted


def place_train_state(mesh, train_state):
    """Commit the train-state arrays to their mesh shardings: classifier
    FCs over 'model' (mesh.param_shardings rules), everything else
    replicated.  Call once before the step loop; outputs of the jitted
    step keep these shardings."""
    p_rules = mesh_lib.param_shardings(mesh, train_state['params'])
    rep = mesh_lib.replicated(mesh)

    def put_params(tree):
        return {k: jax.device_put(v, p_rules.get(k, rep))
                for k, v in tree.items()}

    out = {'params': put_params(train_state['params']),
           'state': {k: jax.device_put(v, rep)
                     for k, v in train_state['state'].items()},
           'opt': {}}
    for k, v in train_state['opt'].items():
        if isinstance(v, dict):  # momentum / acmgrad mirror params
            out['opt'][k] = put_params(v)
        else:
            out['opt'][k] = jax.device_put(v, rep)
    return out


def shard_batch(mesh, batch, fold_model=False):
    """Host numpy batch -> sharded device arrays (the BlobsQueue analog).

    Single-host: one device_put with the batch sharding.  Multi-host (DCN
    mesh under jax.distributed): each process passes its *local* shard of
    the global batch and the pieces are assembled into one global array —
    the reference never scaled past one host (SURVEY.md section 2.10);
    this is the mesh-agnostic extension point.
    """
    sh = mesh_lib.batch_sharding(mesh, fold_model=fold_model)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
