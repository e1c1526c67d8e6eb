"""Worker for tests/test_multihost.py: one jax.distributed process.

Run as: python multihost_worker.py <coord_addr> <process_id> <num_procs>

Together the processes own the same 8 virtual CPU devices as the
single-host mesh tests (8 // num_procs each — 4+4 at 2 processes,
2+2+2+2 at 4), forming the identical (4 data x 2 model) mesh with a
different process boundary.  Exercises shard_batch's
jax.process_count() > 1 branch (pps_tpu/parallel/train_step.py) — the
assembly of process-local batch shards into one global array — and
checks that a jitted global-batch computation sees the *global* batch
(the gradient-allreduce-by-GSPMD contract from parallel/train_step.py's
module docstring).
"""

import os
import sys

_N_LOCAL = 8 // int(sys.argv[3]) if len(sys.argv) > 3 else 4
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (
    os.environ.get('XLA_FLAGS', '') +
    ' --xla_force_host_platform_device_count=%d' % _N_LOCAL)

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def train_mode(pid, workdir):
    """Flagship-tiny TRAIN parity under jax.distributed: the real
    mesh-sharded train step (uint8 augment wire, CRM+triplet, donation,
    optimizer) for ONE step across 2 processes vs the single-process
    8-device run (ref_state.npz / aug_ref.npy from the parent).

    What is asserted at which fidelity — calibrated by measurement
    (the two topologies compile DIFFERENT XLA programs, so reduction
    orders differ at the ulp level; a 50-layer CNN backward amplifies
    that noise exponentially with depth-from-the-loss — early-layer
    updates legitimately differ by tens of percent OF THEIR OWN
    MAGNITUDE while the forward agrees to 1e-5 and every discrete
    choice — augment draws, dropout masks, batch-hard argmax routing,
    hinge gates — was verified identical):

      * augmented global batch: BITWISE equal (the whole multi-host
        input pipeline: process-local shard assembly + fused augment)
      * step loss: 1e-5 relative
      * head-side updates (pps_*/crm_* params+momentum, shallow from
        the loss): tight (rtol 1e-3 / atol 1e-4)
      * body updates: bounded by 1.0x the leaf's own update magnitude
        (2x headroom over the ~0.5x measured cross-topology chaos;
        catches machinery bugs — a missing mean/psum shifts updates by
        a MULTIPLE of their magnitude, and the 1e-5 loss check above
        trips first for anything forward-visible)
      * orbax checkpoint across process counts: BITWISE (the parent
        restores this 2-process save single-process and compares to
        worker_state.npz exactly)
    """
    import os
    import _mh_train_common as common
    from jax.experimental import multihost_utils
    from pps_tpu.engine import checkpoint as ckpt_lib
    from pps_tpu.parallel import mesh as mesh_lib

    cfg = common.tiny_flagship_cfg()

    # input-pipeline parity: bitwise vs the parent's augmented batch
    mesh = mesh_lib.build_mesh(cfg, mesh_shape=common.MESH_SHAPE)
    with mesh:
        db = common.make_dev_batch(mesh)
    aug = common.augmented_images(cfg, mesh, db, jax.random.PRNGKey(1))
    aug_ref = np.load(os.path.join(workdir, 'aug_ref.npy'))
    np.testing.assert_array_equal(aug, aug_ref,
                                  err_msg='augmented batch not bitwise')
    print('MULTIHOST_AUG_BITWISE pid=%d' % pid, flush=True)

    init_ckpt = os.path.join(workdir, 'init.orbax')
    model, ts, loss, mesh = common.run_two_steps(cfg, init_ckpt=init_ckpt,
                                                 n_steps=1)
    got = common.fetch_state(ts, mesh)
    ref = np.load(os.path.join(workdir, 'ref_state.npz'))
    assert sorted(got) == sorted(set(ref.files) - {'__loss__'}), (
        set(got) ^ set(ref.files))
    loss_ref = float(ref['__loss__'])
    assert abs(loss - loss_ref) <= 1e-5 * abs(loss_ref), (loss, loss_ref)

    head_markers = ('/pps', '/crm', '/bpm', '/youtu')
    for k in ref.files:
        if k == '__loss__':
            continue
        if any(m in k for m in head_markers):
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-3,
                                       atol=1e-4, err_msg=k)
        elif k.startswith(('params/', 'opt/momentum/')):
            # measured chaos reaches ~0.5x the update magnitude in the
            # early body; a machinery bug (missing psum/mean) shifts
            # updates by a MULTIPLE of their magnitude and the loss
            # check above fails first anyway
            name = k.split('/')[-1]
            scale = float(np.max(np.abs(ref['opt/momentum/' + name])))
            # absolute floor 1e-4: leaves whose whole update is ~1e-5
            # have noise comparable to the update itself
            tol = 1.0 * scale + 1e-4
            d = float(np.max(np.abs(got[k] - ref[k])))
            assert d <= tol, (k, d, tol)
        else:  # BN running stats etc.
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-2,
                                       atol=5e-2, err_msg=k)

    # multi-host orbax save: each process writes only its own shards
    ckpt_lib.save_checkpoint_orbax(os.path.join(workdir, 'mh.orbax'), ts)
    ckpt_lib.wait_for_orbax()
    multihost_utils.sync_global_devices('mh_ckpt_committed')
    if pid == 0:
        np.savez(os.path.join(workdir, 'worker_state.npz'), **got)
    print('MULTIHOST_TRAIN_OK pid=%d loss=%.6f' % (pid, loss), flush=True)


def _preempt_roidb(n_ids=8, per_id=6):
    roidb = []
    for pid_ in range(1, n_ids + 1):
        for j in range(per_id):
            roidb.append({
                'image': 'mem://%d_%d' % (pid_, j),
                'im_name': '%08d_%04d_%08d.jpg' % (pid_, j % 2 + 1,
                                                   len(roidb)),
                'gt_class': pid_, 'mark': None, 'flipped': False,
                'height': 48, 'width': 20})
    return roidb


def _preempt_decode(path):
    i = abs(int(path.split('://')[1].replace('_', ''))) % 1000
    return (np.random.RandomState(i).rand(48, 20, 3) * 255).astype(
        np.uint8)


def preempt_mode(pid, workdir, variant):
    """Full train_model driver under 2-process jax.distributed.

    variant 'cont': run MAX_ITER epochs straight through.
    variant 'pre': a per-step-counting preempt event fires at the SAME
    step on both processes (the documented multi-host contract for
    caller-supplied events); both raise Preempted with identical
    (epoch, step) and write ONE orbax preempt checkpoint; a second
    train_model call auto-resumes mid-epoch and completes.

    The parent asserts model_final.pkl of 'pre' is BITWISE equal to
    'cont' — same 2-process topology, so no cross-topology reduction
    noise excuse applies.
    """
    import _mh_train_common as common
    from pps_tpu.engine import train as train_lib

    cfg = common.tiny_flagship_cfg()
    cfg.immutable(False)
    cfg.SOLVER.MAX_ITER = 2
    cfg.TRAIN.SNAPSHOT_ITERS = 1
    cfg.TRAIN.AUTO_RESUME = True
    cfg.TPU.CKPT_FORMAT = 'orbax'
    out_dir = os.path.join(workdir, variant)
    roidb = _preempt_roidb()

    from _mh_train_common import PreemptAfterSteps as AfterSteps

    if variant == 'pre':
        try:
            train_lib.train_model(cfg, output_dir=out_dir, roidb=roidb,
                                  decode_fn=_preempt_decode,
                                  num_workers=1, log_period=1,
                                  preempt_event=AfterSteps(3))
            raise AssertionError('expected Preempted')
        except train_lib.Preempted as p:
            assert p.step == 3, (p.epoch, p.step)
            assert p.path.endswith('.orbax') and os.path.isdir(p.path), \
                p.path
            print('MULTIHOST_PREEMPTED pid=%d epoch=%d step=%d'
                  % (pid, p.epoch, p.step), flush=True)
    ck = train_lib.train_model(cfg, output_dir=out_dir, roidb=roidb,
                               decode_fn=_preempt_decode,
                               num_workers=1, log_period=1)
    assert os.path.exists(ck['final']), ck
    print('MULTIHOST_PREEMPT_DONE pid=%d variant=%s' % (pid, variant),
          flush=True)


def main():
    coord, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else 'basic'
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == _N_LOCAL * nprocs
    # one cross-process collective up front, while the processes are
    # still within moments of each other.  The CPU backend's Gloo
    # contexts are created lazily PER PROGRAM INSTANCE under a hard
    # ~30 s rendezvous deadline (key "cpu:gloo/<devices>/<instance>"),
    # so this cannot pre-create the contexts later programs will need —
    # it only bounds startup skew.  The real failure mode (observed
    # twice, reproduced, then passed clean on a quiet host): heavy
    # UNRELATED host load lets one worker finish compiling the train
    # step >30 s before its peer, and the step's own context rendezvous
    # times out.  Real TPU pods ride ICI, not Gloo — CPU-emulation
    # artifact; do not run these tests concurrently with other heavy
    # jobs on a 1-core host (CLAUDE.md).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices('startup-skew-barrier')
    if mode == 'train':
        train_mode(pid, sys.argv[5])
        return
    if mode == 'preempt':
        preempt_mode(pid, sys.argv[5], sys.argv[6])
        return

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
