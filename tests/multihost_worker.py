"""Worker for tests/test_multihost.py: one jax.distributed process.

Run as: python multihost_worker.py <coord_addr> <process_id> <num_procs>

Each process owns 4 virtual CPU devices; together they form the 8-device
(4 data x 2 model) mesh used by the single-host mesh tests.  Exercises
shard_batch's jax.process_count() > 1 branch
(pps_tpu/parallel/train_step.py) — the assembly of process-local batch
shards into one global array — and checks that a jitted global-batch
computation sees the *global* batch (the gradient-allreduce-by-GSPMD
contract from parallel/train_step.py's module docstring).
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_force_host_platform_device_count=4')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    coord, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel import train_step as ts_lib

    mesh = mesh_lib.build_mesh(mesh_shape=(4, 2))

    # global batch 16 x 4; this process holds rows [pid*8, pid*8+8)
    global_x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    local = global_x[pid * 8:(pid + 1) * 8]
    sb = ts_lib.shard_batch(mesh, {'x': local}, fold_model=True)
    assert sb['x'].shape == (16, 4), sb['x'].shape

    # global-batch "training" objective: grad of the global mean-square
    # must be identical on every process (GSPMD inserts the reduction)
    w = jax.device_put(np.ones((4,), np.float32),
                       mesh_lib.replicated(mesh))

    def loss(w_, b):
        return jnp.mean(jnp.square(b['x'] @ w_))

    val, grad = jax.jit(jax.value_and_grad(loss))(w, sb)
    want_val = np.mean(np.square(global_x @ np.ones(4)))
    want_grad = 2.0 * (global_x.T @ (global_x @ np.ones(4))) / 16.0
    np.testing.assert_allclose(float(val), want_val, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(grad)), want_grad, rtol=1e-6)

    # eval-side counterpart: batched extraction over the mesh — every
    # process drives the same loop, put_global_batch transfers only its
    # rows, fetch_global allgathers identical full features everywhere
    # (parallel/eval_step.py; replaces the reference's subprocess range
    # sharding, test_engine.py:184-229)
    from pps_tpu.parallel import eval_step as es
    rep = mesh_lib.replicated(mesh)
    bsh = mesh_lib.batch_sharding(mesh, fold_model=True)
    proj = jax.device_put(np.eye(4, 3, dtype=np.float32), rep)
    fn = jax.jit(lambda p, s, x: x @ p,
                 in_shardings=(rep, rep, bsh), out_shardings=bsh)
    images = np.arange(21 * 4, dtype=np.float32).reshape(21, 4)
    with mesh:
        feats = es.extract_features(fn, proj, None, images,
                                    batch_size=16, n_devices=8, mesh=mesh)
    np.testing.assert_allclose(feats, images @ np.eye(4, 3), rtol=1e-6)
    print('MULTIHOST_OK pid=%d val=%.6f' % (pid, float(val)), flush=True)


if __name__ == '__main__':
    main()
