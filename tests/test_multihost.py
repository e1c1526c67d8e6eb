"""2-process jax.distributed test of the multi-host shard_batch branch.

The reference never scaled past one host (its multi-GPU story is
subprocess range-sharding on one machine, reference utils/subprocess.py);
shard_batch's `jax.process_count() > 1` branch is our beyond-reference
extension and needs real multi-process coverage: two coordinated jax
processes, 4 virtual CPU devices each, assembling process-local batch
halves into one global array over the (4 data x 2 model) mesh.
"""

import os
import socket
import subprocess
import sys

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_batch():
    coord = '127.0.0.1:%d' % _free_port()
    env = dict(os.environ)
    # children configure their own device farm / platform
    env.pop('XLA_FLAGS', None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(pid), '2'],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'process %d failed:\n%s' % (pid, out)
        assert 'MULTIHOST_OK pid=%d' % pid in out, out


def _run_pair(args, logdir, timeout=560):
    """Run the 2-process worker pair with stdout to FILES, not pipes:
    a chatty worker (train_model logs json_stats per step) fills a
    64 KB pipe while the parent drains the OTHER process first, blocks
    mid-step, and deadlocks its peer inside the next collective."""
    coord = '127.0.0.1:%d' % _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    os.makedirs(logdir, exist_ok=True)
    logs = [os.path.join(logdir, 'worker%d.log' % pid) for pid in range(2)]
    procs = []
    handles = []
    for pid in range(2):
        f = open(logs[pid], 'w')
        handles.append(f)
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER, coord, str(pid), '2'] + args,
            stdout=f, stderr=subprocess.STDOUT, env=env, text=True))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in handles:
            f.close()
    outs = [open(l).read() for l in logs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, 'process %d failed:\n%s' % (pid, out)
    return outs


def test_two_process_preempt_resume_bitwise(tmp_path):
    """The FULL train_model driver under 2-process jax.distributed, with
    mid-epoch preemption: both processes agree on the preempt step
    (per-step event poll), write ONE orbax preempt checkpoint, raise
    Preempted with identical (epoch, step), auto-resume mid-epoch, and
    the resulting model_final.pkl is BITWISE equal to a continuous
    2-process run of the same schedule (same topology — no reduction-
    noise exemption).  Also covers the multi-host pkl writer (process-0
    write + cross-host barrier in save_checkpoint)."""
    import numpy as np
    from pps_tpu.utils.io import load_object

    workdir = str(tmp_path)
    # cold-cache legs compile the full train_model program set (softmax
    # + triplet epoch steps + augment) in two processes on this 1-core
    # host — allow well past the warm-cache ~2 min
    outs = _run_pair(['preempt', workdir, 'cont'],
                     os.path.join(workdir, 'logs_cont'), timeout=1200)
    for pid, out in enumerate(outs):
        assert 'MULTIHOST_PREEMPT_DONE pid=%d variant=cont' % pid in out, \
            out

    outs = _run_pair(['preempt', workdir, 'pre'],
                     os.path.join(workdir, 'logs_pre'), timeout=1200)
    marks = []
    for pid, out in enumerate(outs):
        assert 'MULTIHOST_PREEMPT_DONE pid=%d variant=pre' % pid in out, \
            out
        m = [l for l in out.splitlines()
             if l.startswith('MULTIHOST_PREEMPTED pid=%d' % pid)]
        assert m, out
        marks.append(m[0].split('pid=%d ' % pid, 1)[1])
    assert marks[0] == marks[1], marks  # same (epoch, step) on both

    cont = load_object(os.path.join(workdir, 'cont',
                                    'model_final.pkl'))['blobs']
    pre = load_object(os.path.join(workdir, 'pre',
                                   'model_final.pkl'))['blobs']
    assert sorted(cont) == sorted(pre)
    for k in cont:
        np.testing.assert_array_equal(cont[k], pre[k], err_msg=k)


import pytest


@pytest.mark.parametrize('nprocs', [2, 4])
def test_multiprocess_flagship_train(tmp_path, nprocs):
    """Real multi-host TRAINING parity (VERDICT r2 #3; r3 #7 widened it
    over process counts): the flagship-tiny train step (same cfg as
    dryrun_multichip — uint8 augment wire, CRM+triplet, donation,
    optimizer) under 2- and 4-process jax.distributed vs the
    single-process 8-device run — the SAME global (4 data x 2 model)
    mesh with a different process boundary (4+4 and 2+2+2+2 local
    devices), which is exactly where process-count assumptions (local
    row slicing, addressable-shard checkpoint writes) break.  Assertion
    fidelity is calibrated per subsystem (see
    multihost_worker.train_mode for the measured rationale): augmented
    global batch BITWISE, loss 1e-5 relative, head-side updates tight,
    body updates bounded by their own update magnitude (different XLA
    programs -> ulp reduction noise amplified exponentially with
    backward depth), and orbax checkpoints cross process counts both
    ways:
      * parent saves the init state single-process -> workers restore it
        into the N-process sharded topology (reshard-on-restore),
      * workers save the trained state from N processes -> parent
        restores it single-process and compares BITWISE against the
        workers' own fetched state (worker_state.npz)."""
    import numpy as np
    import _mh_train_common as common
    from pps_tpu.engine import checkpoint as ckpt_lib

    workdir = str(tmp_path)

    # reference: single-process over the same (4 data x 2 model) mesh
    cfg = common.tiny_flagship_cfg()
    _, ts0, _, mesh = common.run_two_steps(cfg, n_steps=0)
    init_ckpt = os.path.join(workdir, 'init.orbax')
    ckpt_lib.save_checkpoint_orbax(init_ckpt, ts0)
    ckpt_lib.wait_for_orbax()
    cfg = common.tiny_flagship_cfg()
    with mesh:
        db = common.make_dev_batch(mesh)
    import jax
    aug_ref = common.augmented_images(cfg, mesh, db, jax.random.PRNGKey(1))
    np.save(os.path.join(workdir, 'aug_ref.npy'), aug_ref)
    cfg = common.tiny_flagship_cfg()
    _, ts_ref, loss_ref, mesh = common.run_two_steps(
        cfg, init_ckpt=init_ckpt, n_steps=1)
    ref = common.fetch_state(ts_ref, mesh)
    assert loss_ref is not None and np.isfinite(loss_ref)
    ref['__loss__'] = np.float64(loss_ref)
    np.savez(os.path.join(workdir, 'ref_state.npz'), **ref)

    coord = '127.0.0.1:%d' % _free_port()
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    # stdout to FILES, not pipes: a worker that fills a 64 KB pipe while
    # the parent drains a DIFFERENT process first blocks inside a
    # collective and deadlocks the whole group (CLAUDE.md)
    logs = [os.path.join(workdir, 'worker%d.log' % pid)
            for pid in range(nprocs)]
    log_fhs = [open(lp, 'w') for lp in logs]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coord, str(pid), str(nprocs),
             'train', workdir],
            stdout=log_fhs[pid], stderr=subprocess.STDOUT,
            env=env, text=True)
        for pid in range(nprocs)
    ]
    try:
        for p in procs:
            p.wait(timeout=560)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for fh in log_fhs:
            fh.close()
    for pid, p in enumerate(procs):
        with open(logs[pid]) as f:
            out = f.read()
        assert p.returncode == 0, 'process %d failed:\n%s' % (pid, out)
        assert 'MULTIHOST_AUG_BITWISE pid=%d' % pid in out, out
        assert 'MULTIHOST_TRAIN_OK pid=%d' % pid in out, out

    # save-from-2 -> restore-into-1: the workers' orbax checkpoint
    # restored in THIS single process equals the workers' own fetched
    # state bitwise (checkpoint fidelity isolated from the
    # cross-topology numerics above)
    import numpy as _np
    wref = dict(_np.load(os.path.join(workdir, 'worker_state.npz')))
    # template restore: the checkpoint was written under the 2-process
    # device topology; ts_ref's shardings re-shard it onto this
    # process's 8 local devices (the reshard-on-restore contract)
    restored = ckpt_lib.load_checkpoint_orbax(
        os.path.join(workdir, 'mh.orbax'), ts_ref)
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(prefix + '/' + k if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk('', dict(restored))
    assert sorted(flat) == sorted(wref)
    for k in wref:
        np.testing.assert_array_equal(flat[k], wref[k], err_msg=k)
