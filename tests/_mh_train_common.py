"""Shared setup for the multi-host flagship-tiny training test.

Used by BOTH the single-process reference run (tests/test_multihost.py,
8 virtual CPU devices in the pytest process) and the 2-process
jax.distributed run (tests/multihost_worker.py, 4+4 devices) so the two
execute the identical program: same cfg as __graft_entry__.
dryrun_multichip (uint8 device-augment wire, padded valid_hw form, (4
data x 2 model) mesh, CRM + triplet losses), same batch, same PRNG keys.
No import-time side effects — callers configure the jax platform first.
"""

import numpy as np

MESH_SHAPE = (4, 2)
P_, K_ = 4, 2
BATCH = P_ * K_
NUM_CLASSES = 32 * MESH_SHAPE[1] + 1


class PreemptAfterSteps(object):
    """Event-alike whose is_set() reads True from the n-th poll on;
    train_model polls once per step => deterministic preempt point.
    Shared by the single-process and multi-host preemption tests so a
    change to the polling contract breaks in exactly one place."""

    def __init__(self, n):
        self.calls, self.n = 0, n

    def clear(self):
        pass

    def is_set(self):
        self.calls += 1
        return self.calls >= self.n


def tiny_flagship_cfg():
    import __graft_entry__ as g
    return g._flagship_cfg(scale=(32, 96), num_classes=NUM_CLASSES,
                           ims_per_batch=BATCH, p=P_, k=K_,
                           dtype='float32')


def make_host_batch():
    """The dryrun batch: raw uint8 random decodes + padded valid_hw wire
    (random pixels keep the BN batch statistics well-conditioned;
    structured constant-block images degenerate the batch variance at
    batch 8 and amplify cross-topology reduction-order noise ~1000x in
    the BN backward)."""
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(P_), K_).astype(np.int32)
    oh = np.zeros((BATCH, NUM_CLASSES - 1), np.float32)
    oh[np.arange(BATCH), labels] = 1.0
    valid_hw = np.stack([
        np.where(np.arange(BATCH) % 2 == 0, 48, 40),
        np.where(np.arange(BATCH) % 3 == 0, 20, 16)], axis=1).astype(
            np.int32)
    return {
        'data_u8': rng.randint(0, 256, (BATCH, 48, 20, 3)).astype(np.uint8),
        'flipped': (np.arange(BATCH) % 2 == 0),
        'valid_hw': valid_hw,
        'labels_int32': labels,
        'labels_oh': oh,
    }


def run_two_steps(cfg, init_ckpt=None, n_steps=2):
    """Build the model, (optionally) restore the orbax init checkpoint,
    run n_steps of the REAL mesh-sharded train step on the global batch.
    Works identically single-process (8 local devices) and under
    jax.distributed (shard_batch routes through
    make_array_from_process_local_data).  Returns (model, train_state).
    """
    import jax
    import jax.numpy as jnp
    from pps_tpu.engine import checkpoint as ckpt_lib
    from pps_tpu.models.model import build_model
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel import train_step as ts_lib
    from pps_tpu.solver import optimizer as opt_lib

    mesh = mesh_lib.build_mesh(cfg, mesh_shape=MESH_SHAPE)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    meta = opt_lib.make_param_meta(params, cfg)
    opt_state = opt_lib.init_opt_state(
        params, flavor=opt_lib.flavor_from_cfg(cfg),
        iter_size=cfg.REID.ITER_SIZE)
    step = ts_lib.make_train_step(model, cfg, mesh, meta=meta)

    with mesh:
        train_state = ts_lib.place_train_state(
            mesh, {'params': params, 'state': state, 'opt': opt_state})
        if init_ckpt is not None:
            # orbax restore onto this topology's placements (covers the
            # reshard-on-restore path across process counts)
            train_state = ckpt_lib.load_checkpoint_orbax(
                init_ckpt, train_state)
        # each process passes only ITS rows of the global batch
        dev_batch = make_dev_batch(mesh)
        if bool(int(__import__('os').environ.get('PPS_MH_DEBUG', '0'))):
            import hashlib
            rep = mesh_lib.replicated(mesh)
            g = jax.jit(lambda x: x, out_shardings=rep)
            for key in ('data_u8', 'labels_int32', 'flipped'):
                hb = hashlib.sha1(np.asarray(
                    jax.device_get(g(dev_batch[key]))).tobytes())
                print('MHDBG %s %s' % (key, hb.hexdigest()), flush=True)
            hw = hashlib.sha1(np.asarray(jax.device_get(
                g(train_state['params']['conv1_w']))).tobytes())
            print('MHDBG conv1_w@init %s' % hw.hexdigest(), flush=True)
        if jax.process_count() > 1:
            # AOT-compile the step and BARRIER before first execution.
            # The CPU backend's Gloo collective contexts are created
            # lazily per program instance at FIRST EXECUTION under a
            # hard ~30 s rendezvous deadline; the train-step compile is
            # the long pole (minutes on a cold or foreign-machine cache
            # under host load), so without this barrier one worker can
            # reach the step's context rendezvous minutes before its
            # peer and fail with DEADLINE_EXCEEDED.  The barrier is a
            # coordination-service one — a device-collective barrier
            # would rendezvous its own Gloo context under the same 30 s
            # deadline and time out for the fast worker (this is also
            # exactly what engine/train.py runs in production).
            # Executing the AOT-compiled object keeps the compile out
            # of the first call entirely.
            from pps_tpu.parallel.mesh import coordination_barrier
            step = step.lower(
                train_state, dev_batch, jnp.float32(0.01),
                jnp.float32(1.0), jax.random.PRNGKey(1)).compile()
            coordination_barrier('train-step-compiled')
        loss = None
        for i in range(n_steps):
            train_state, logs = step(
                train_state, dev_batch, jnp.float32(0.01),
                jnp.float32(1.0), jax.random.PRNGKey(i + 1))
            loss = float(logs['loss'])
            print('MHDBG loss[%d] %.9f' % (i, loss), flush=True)
    return model, train_state, loss, mesh


def augmented_images(cfg, mesh, dev_batch, step_rng):
    """The images the train step actually consumes: run the fused
    device-augment exactly as the step does (same rng split,
    parallel/train_step.py) and gather to host numpy — used to assert
    the multi-host input pipeline is BITWISE identical to the
    single-process one."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pps_tpu.data import device_augment as aug_lib

    spec = aug_lib.augment_spec(cfg)
    pm = np.asarray(cfg.PIXEL_MEANS)
    _, aug_rng = jax.random.split(step_rng)

    @jax.jit
    def aug(r, b):
        return aug_lib.augment_batch(r, b['data_u8'], b['flipped'], spec,
                                     pm, valid_hw=b.get('valid_hw'))
    rep = NamedSharding(mesh, P())
    gather = jax.jit(lambda x: x, out_shardings=rep)
    with mesh:
        return np.asarray(jax.device_get(gather(aug(aug_rng, dev_batch))))


def make_dev_batch(mesh):
    """Shard the host batch exactly like run_two_steps does."""
    import jax
    from pps_tpu.parallel import train_step as ts_lib
    host_batch = make_host_batch()
    if jax.process_count() > 1:
        rows = BATCH // jax.process_count()
        lo = jax.process_index() * rows
        local = {k: v[lo:lo + rows] for k, v in host_batch.items()}
        return ts_lib.shard_batch(mesh, local)
    return ts_lib.shard_batch(mesh, host_batch)


def fetch_state(train_state, mesh):
    """train_state -> {path: full numpy array on every host}.

    Each leaf is re-committed to the fully-replicated sharding (a jitted
    identity with replicated out_shardings = one XLA all-gather), after
    which every process holds an addressable copy — works identically
    for the single-process and jax.distributed topologies.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    gather = jax.jit(lambda x: x, out_shardings=rep)

    out = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(prefix + '/' + k if prefix else k, v)
        else:
            out[prefix] = np.asarray(jax.device_get(gather(tree)))

    with mesh:
        walk('', dict(train_state))
    return out
