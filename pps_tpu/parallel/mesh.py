"""Mesh + sharding-rule construction.

The reference replicates the whole graph per GPU and sum-allreduces
gradients (reference modeling/optimizer.py:57-87, loss scale 1/N at
detector.py:561-566).  Here device placement is data: one 2-D
``Mesh(('data', 'model'))`` plus `NamedSharding` rules; a single jitted
train step computes the *global*-batch loss, so gradient averaging falls
out of differentiation itself and XLA lowers the cross-device reductions
to ICI collectives.

Sharding rules
  batch arrays      : leading dim over 'data' (x 'model' when it divides)
  classifier FCs    : stacked [R, D, C] head/CRM class dim over 'model'
  everything else   : replicated

Only the identity-classifier FCs are worth tensor-sharding in this model:
with R=31 combos and C=O(1500) classes they dominate head parameter count,
and their matmul contracts over the replicated 128-d feature, so the shard
boundary needs no resharding of activations (output stays 'model'-sharded
into the per-class softmax CE, which reduces over classes with one psum).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_BARRIER_SEQ = {}


def coordination_barrier(name, timeout_s=1800):
    """Align all processes via the jax.distributed coordination service
    (plain gRPC to the coordinator) — NOT a device collective.

    A collective barrier (``multihost_utils.sync_global_devices``) is
    itself a device program: under the CPU backend its Gloo context is
    created lazily at first execution with a hard ~30 s rendezvous
    deadline, so using it to absorb COMPILE skew is self-defeating — a
    worker that cache-hits its compile arrives minutes before one
    compiling cold, and the barrier's own context rendezvous times out
    with DEADLINE_EXCEEDED (the exact failure it was meant to prevent;
    see tests/multihost_worker.py on per-program-instance contexts).
    The coordination-service barrier tolerates skew up to ``timeout_s``
    and creates no device programs; the processes that leave it then
    execute their first real collective in lockstep, inside the Gloo
    deadline.  No-op when jax.distributed was never initialized.

    Coordination-service barrier ids are single-use; a per-name counter
    (advanced identically in every process, since all run this same
    call sequence) keeps repeated calls distinct.
    """
    from jax._src import distributed
    client = getattr(distributed.global_state, 'client', None)
    if client is None:
        return
    seq = _BARRIER_SEQ.get(name, 0)
    _BARRIER_SEQ[name] = seq + 1
    client.wait_at_barrier('{}#{}'.format(name, seq),
                           timeout_in_ms=int(timeout_s * 1000))


def build_mesh(cfg=None, devices=None, mesh_shape=None):
    """Create the (data, model) mesh.

    mesh_shape: (n_data, n_model); -1 in the data slot consumes all
    remaining devices.  Defaults: cfg.TPU.MESH_SHAPE, else all-data.
    """
    if devices is None:
        devices = jax.devices()
        if cfg is not None and cfg.TPU.NUM_DEVICES > 0:
            want = cfg.TPU.NUM_DEVICES
            assert want <= len(devices), (want, len(devices))
            if jax.process_count() > 1:
                # take want/nprocs from EACH process's addressable
                # devices: a global-prefix slice could leave a process
                # with none of its own devices in the mesh (collectives
                # would then deadlock / shardings be unaddressable)
                nproc = jax.process_count()
                assert want % nproc == 0, (
                    'TPU.NUM_DEVICES (%d) must be divisible by '
                    'process_count (%d)' % (want, nproc))
                per = want // nproc
                by_proc = {}
                for d in devices:
                    by_proc.setdefault(d.process_index, []).append(d)
                assert all(len(v) >= per for v in by_proc.values()), (
                    'some process has fewer than %d devices' % per)
                devices = [d for p in sorted(by_proc)
                           for d in by_proc[p][:per]]
            else:
                devices = devices[:want]
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = tuple(cfg.TPU.MESH_SHAPE) if cfg is not None else (-1, 1)
    n_data, n_model = mesh_shape
    if n_data == -1:
        assert n % n_model == 0, (n, n_model)
        n_data = n // n_model
    assert n_data * n_model <= n, (mesh_shape, n)
    devices = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    axis_names = ('data', 'model')
    if cfg is not None:
        axis_names = (cfg.TPU.DATA_AXIS, cfg.TPU.MODEL_AXIS)
    return Mesh(devices, axis_names)


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh, fold_model=True):
    """Sharding for [B, ...] arrays: B split over the data axis (and the
    model axis too when folding both into pure data parallelism, e.g. at
    eval time where there is no model-sharded matmul on the path)."""
    data_ax, model_ax = mesh.axis_names
    if fold_model and mesh.shape[model_ax] > 1:
        return NamedSharding(mesh, P((data_ax, model_ax)))
    return NamedSharding(mesh, P(data_ax))


# parameter names whose last dim is the identity-class dim.
def _is_class_sharded(name):
    return name.endswith('fc_w') or name.endswith('fc_b') or (
        '_fc8' in name and (name.endswith('_w') or name.endswith('_b')))


def param_shardings(mesh, params):
    """{name: NamedSharding} — classifier FCs sharded over 'model',
    everything else replicated."""
    data_ax, model_ax = mesh.axis_names
    n_model = mesh.shape[model_ax]
    out = {}
    for name, p in params.items():
        if (n_model > 1 and _is_class_sharded(name)
                and p.shape[-1] % n_model == 0):
            spec = [None] * (p.ndim - 1) + [model_ax]
            out[name] = NamedSharding(mesh, P(*spec))
        else:
            out[name] = NamedSharding(mesh, P())
    return out
