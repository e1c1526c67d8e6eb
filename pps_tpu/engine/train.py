"""Training driver: epoch loop, LR feeding, checkpointing, auto-resume.

Rebuild of /root/reference/detectron/utils/train.py:52-250 on the TPU
stack: one jitted mesh-sharded step per iteration, the epoch-alternating
triplet schedule expressed as the pure `EpochSchedule`, momentum correction
on LR change (reference detector.py:539-559), per-epoch reference-pkl
checkpoints with the same auto-resume contract, NaN abort, and `json_stats`
logging.
"""

import logging
import os
import signal
import sys
import threading

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.data.json_dataset import combined_roidb_for_training
from pps_tpu.data.loader import ReIDLoader
from pps_tpu.engine import checkpoint as ckpt_lib
from pps_tpu.engine.stats import TrainingStats
from pps_tpu.models.model import build_model
from pps_tpu.parallel import mesh as mesh_lib
from pps_tpu.parallel import train_step as ts_lib
from pps_tpu.solver import lr_policy
from pps_tpu.solver import optimizer as opt_lib

logger = logging.getLogger(__name__)

# Preemption: TPU-VM maintenance events and preemptible/spot capacity
# deliver SIGTERM with a grace window.  The handler only sets this flag;
# the training loop checkpoints after the in-flight step and raises
# `Preempted`, so a restarted job auto-resumes MID-epoch losing at most
# one step (the plan-based sampler + fold_in(base, global_step) PRNG make
# the resumed stream bitwise-identical to an uninterrupted run).  The
# reference had no preemption story — its loader cursor (set_start_iter,
# reference roi_data/loader.py:124) could seek, but nothing saved outside
# epoch boundaries.
_PREEMPT = threading.Event()


def request_preemption(signum=None, frame=None):
    """Ask the running train_model to checkpoint and exit after the
    in-flight step (safe from signal handlers and other threads)."""
    _PREEMPT.set()


class Preempted(Exception):
    """Raised by train_model after a preemption checkpoint is durably
    written.  Carries (epoch, step, path) of the resume point; the CLI
    maps it to exit code 75 (EX_TEMPFAIL: transient, retry the same
    command)."""

    def __init__(self, epoch, step, path):
        super(Preempted, self).__init__(
            'preempted after {} steps of epoch {}; resume point {}'
            .format(step, epoch, path))
        self.epoch = epoch
        self.step = step
        self.path = path


def create_model(cfg, output_dir, mesh=None):
    """Build model + init/resume state.  Returns
    (model, params, state, opt_state, start_epoch, start_step,
    resumed_final).

    mesh: required for orbax resume under multi-host — the restore
    template must carry shardings that are GLOBALLY consistent across
    processes (fully-replicated over the mesh); per-process local-device
    templates make orbax attempt cross-host device transfers."""
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(cfg.RNG_SEED))
    opt_state = opt_lib.init_opt_state(
        params, flavor=opt_lib.flavor_from_cfg(cfg),
        iter_size=cfg.REID.ITER_SIZE)

    final_path = os.path.join(output_dir, 'model_final.pkl')
    if cfg.TRAIN.AUTO_RESUME and os.path.exists(final_path):
        logger.info('model_final.pkl exists; skipping training')
        return model, params, state, opt_state, -1, 0, True

    start_epoch, start_step = 0, 0
    if cfg.TRAIN.AUTO_RESUME:
        path, epoch, step = ckpt_lib.find_resume_checkpoint(output_dir)
        if path is not None:
            logger.info('Auto-resuming from %s (epoch %d, step %d)',
                        path, epoch, step)
            if path.endswith('.orbax'):
                tmpl = {'params': params, 'state': state,
                        'opt': opt_state}
                if mesh is not None and jax.process_count() > 1:
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P
                    rep = NamedSharding(mesh, P())
                    tmpl = jax.tree_util.tree_map(
                        lambda x: jax.ShapeDtypeStruct(
                            x.shape, x.dtype, sharding=rep), tmpl)
                ts = ckpt_lib.load_checkpoint_orbax(path, tmpl)
                params, state, opt_state = (ts['params'], ts['state'],
                                            ts['opt'])
            else:
                params, state, opt_state = ckpt_lib.load_checkpoint(
                    path, model, params, state, opt_state=opt_state)
            start_epoch, start_step = epoch, step
    if start_epoch == 0 and start_step == 0 and cfg.TRAIN.WEIGHTS:
        logger.info('Bootstrapping weights from %s', cfg.TRAIN.WEIGHTS)
        params, state, _ = ckpt_lib.load_checkpoint(
            cfg.TRAIN.WEIGHTS, model, params, state)
    return model, params, state, opt_state, start_epoch, start_step, False


def train_model(cfg, output_dir=None, roidb=None, decode_fn=None,
                num_workers=None, log_period=None, preempt_event=None):
    """Run the full training schedule.  Returns {epoch: ckpt_path}.

    While the loop runs (from the main thread), SIGTERM is wired to
    `request_preemption`: the in-flight step finishes, a mid-epoch
    resume checkpoint is written synchronously, and `Preempted` is
    raised.  preempt_event overrides the module-level flag (embedding /
    tests); auto-resume then continues from the exact step.

    output_dir defaults to the reference convention
    <OUTPUT_DIR>/train/<dataset>/ (reference utils/train.py:144 via
    get_output_dir); num_workers defaults to DATA_LOADER.NUM_THREADS.
    roidb/decode_fn injectable for tests (reference tests patched
    get_minibatch the same way, tests/test_loader.py:88-95).
    """
    if output_dir is None:
        from pps_tpu.config import get_output_dir
        output_dir = get_output_dir(cfg.TRAIN.DATASETS, training=True)
    os.makedirs(output_dir, exist_ok=True)
    from pps_tpu.utils.env import configure_jax_cache
    configure_jax_cache()
    checkpoints = {}

    mesh = mesh_lib.build_mesh(cfg)
    model, params, state, opt_state, start_epoch, resume_step, done = \
        create_model(cfg, output_dir, mesh=mesh)
    if done:
        checkpoints['final'] = os.path.join(output_dir, 'model_final.pkl')
        return checkpoints

    if roidb is None:
        roidb, _ = combined_roidb_for_training(
            cfg.TRAIN.DATASETS, use_flipped=cfg.TRAIN.USE_FLIPPED)

    if jax.process_count() > 1 and cfg.TPU.CKPT_FORMAT != 'orbax':
        # pkl epoch snapshots stream from a background thread, but in
        # multi-host the pkl writer must all-gather process-sharded
        # leaves — a collective, illegal off the main thread while
        # training computations run.  orbax snapshots are multi-host
        # native (each host streams only its own shards); model_final
        # stays a reference-interop pkl (written on the main thread).
        raise ValueError(
            'multi-host training requires TPU.CKPT_FORMAT: orbax '
            '(epoch snapshots write from a background thread; the pkl '
            'writer needs cross-host gathers). model_final.pkl is '
            'still produced for reference interop.')
    meta = opt_lib.make_param_meta(params, cfg)
    # TRAIN.FREEZE_AT / FREEZE_CONV_BODY: frozen params get no update op
    # (reference optimizer.py:90-157 builds updates only for params with
    # gradients — no weight decay, no momentum below the freeze point)
    trainable = opt_lib.trainable_from_cfg(cfg, params)
    step_fn = ts_lib.make_train_step(model, cfg, mesh, meta=meta,
                                     trainable=trainable)

    def device_put_fn(batch):
        if cfg.TPU.WIRE_DTYPE == 'bfloat16' and 'data' in batch:
            batch = dict(batch, data=jnp.bfloat16(batch['data']))
        return ts_lib.shard_batch(mesh, batch)

    loader = ReIDLoader(roidb, cfg, num_workers=num_workers,
                        decode_fn=decode_fn, device_put_fn=device_put_fn,
                        raw=bool(cfg.TPU.DEVICE_AUGMENT))
    if start_epoch > 0:
        loader.skip_epochs(start_epoch)  # resume sampling determinism
    sched = loader.schedule
    total_steps = sched.total_steps()
    stats = TrainingStats(total_steps, log_period=log_period)

    train_state = ts_lib.place_train_state(
        mesh, {'params': params, 'state': state, 'opt': opt_state})
    # per-step PRNG = fold_in(base, global_step): a pure function of the
    # step index, so an auto-resumed run continues the exact augmentation/
    # dropout stream of a continuous run (sequential splitting would
    # restart the stream from the base key at every resume)
    base_rng = jax.random.PRNGKey(cfg.RNG_SEED + 1)
    global_step = sched.steps_before_epoch(start_epoch) + resume_step
    start_step = global_step
    # deterministic resume of the LR-change detector: recompute the LAST
    # trained step's LR so a resumed run fires the same momentum
    # correction a continuous run would at this boundary (LR is a pure
    # function of (epoch, step), so this costs nothing and avoids
    # persisting cur_lr in the checkpoint)
    cur_lr = None
    if global_step > 0:
        if resume_step > 0:
            pe, pi = start_epoch, resume_step - 1
        else:
            pe, pi = start_epoch - 1, -1
            while pe >= 0:
                pi = sched.epoch_len(pe) - 1
                if pi >= 0:
                    break
                pe -= 1
        if pe >= 0 and pi >= 0:
            cur_lr = float(lr_policy.get_lr_at_iter(
                cfg, sched.lr_iter(pe, pi), pe, sched.ipe))
    snapshot_period = max(1, cfg.TRAIN.SNAPSHOT_ITERS)

    # op-level tracing: set PPS_TPU_PROFILE_DIR to capture a jax profiler
    # trace of steps [5, 15) viewable in xprof/tensorboard (the reference
    # had only wall-clock timers, SURVEY.md section 5 tracing).
    profile_dir = os.environ.get('PPS_TPU_PROFILE_DIR')
    profile_window = (5, 15)

    # structure dump (the reference's net.pbtxt/print_net analog,
    # utils/train.py:244-250): jaxpr of the train step to OUTPUT_DIR.
    if os.environ.get('PPS_TPU_DUMP_JAXPR'):
        # abstract tracing only — does not consume sampler state
        gb = sched.global_batch
        w_, h_ = cfg.REID.SCALE
        b0 = {'data': jax.ShapeDtypeStruct((gb, h_, w_, 3), jnp.float32),
              'labels_int32': jax.ShapeDtypeStruct((gb,), jnp.int32),
              'labels_oh': jax.ShapeDtypeStruct(
                  (gb, cfg.MODEL.NUM_CLASSES - 1), jnp.float32)}
        jaxpr = jax.make_jaxpr(step_fn.raw_step)(
            train_state, b0, jnp.float32(0.01), jnp.float32(0.0),
            jax.random.PRNGKey(0))
        with open(os.path.join(output_dir, 'train_step.jaxpr.txt'),
                  'w') as f:
            f.write(str(jaxpr))
        logger.info('wrote train_step.jaxpr.txt (%d eqns)',
                    len(jaxpr.jaxpr.eqns))

    from concurrent.futures import ThreadPoolExecutor
    saver = ThreadPoolExecutor(1)  # background checkpoint writer
    saver_fut = None
    preempt = preempt_event if preempt_event is not None else _PREEMPT
    preempt.clear()  # a stale flag must not kill the fresh run at step 1
    # Multi-host: a SIGTERM that reaches ONE host must not make that
    # process exit unilaterally (the others would hang in the next
    # collective).  Under jax.distributed the coordination service owns
    # SIGTERM (jax_enable_preemption_service, on by default): it
    # propagates the notice and reached_preemption_sync_point(step)
    # returns True on EVERY host at the same agreed step — so we install
    # our own handler only single-process, and poll the sync point per
    # step otherwise.  A caller-supplied preempt_event in multi-host
    # must fire at the same step on all processes (a per-step poll
    # counter does; see tests).
    preempt_sync = None
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def preempt_sync(step):  # noqa: F811
            try:
                return multihost_utils.reached_preemption_sync_point(step)
            except RuntimeError:  # preemption service disabled
                return False
    # multi-process: the step is AOT-compiled and the processes barrier
    # between compile and first execution (see loop below)
    mh_step = None
    old_sig, sig_installed = None, False
    if (jax.process_count() == 1 and
            threading.current_thread() is threading.main_thread()):
        try:
            old_sig = signal.signal(signal.SIGTERM, request_preemption)
            sig_installed = True
        except (ValueError, OSError):  # no signal support here
            pass
    try:
      with mesh:
        for ep in range(start_epoch, cfg.SOLVER.MAX_ITER):
            ep_start = resume_step if ep == start_epoch else 0
            for i, loss_scale, batch in loader.iter_epoch(ep, ep_start):
                if profile_dir and global_step == profile_window[0]:
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and global_step == profile_window[1]:
                    jax.profiler.stop_trace()
                if global_step == start_step + stats.LOG_PERIOD:
                    # shed the first-iteration (compile) outliers from
                    # time/ETA (reference utils/train.py:116-119)
                    logger.info('Resetting iteration timer after warm-up')
                    stats.ResetIterTimer()
                stats.IterTic()
                lr = float(lr_policy.get_lr_at_iter(
                    cfg, sched.lr_iter(ep, i), ep, sched.ipe))
                if cur_lr is not None and cur_lr != lr:
                    ratio = opt_lib.get_lr_change_ratio(cur_lr, lr)
                    if ratio > cfg.SOLVER.LOG_LR_CHANGE_THRESHOLD:
                        # logged independently of momentum scaling
                        # (reference detector.py:506-515)
                        logger.info(
                            'Changing learning rate %.6f -> %.6f at '
                            'iter %d', cur_lr, lr, global_step)
                    # reference guard detector.py:535: flag + tiny-LR floor
                    if (cfg.SOLVER.SCALE_MOMENTUM and cur_lr > 1e-7 and
                            ratio > cfg.SOLVER.SCALE_MOMENTUM_THRESHOLD):
                        logger.info('LR change %.6f -> %.6f; scaling '
                                    'update history by %.6f',
                                    cur_lr, lr, lr / cur_lr)
                        train_state['opt'] = opt_lib.correct_momentum(
                            train_state['opt'], lr / cur_lr)
                cur_lr = lr
                step_rng = jax.random.fold_in(base_rng, global_step)
                if jax.process_count() > 1 and mh_step is None:
                    # AOT-compile the step, then BARRIER, then run the
                    # compiled object: collective contexts are created
                    # lazily at FIRST EXECUTION (the CPU backend's Gloo
                    # rendezvous has a hard ~30 s deadline), so
                    # compile-time skew between workers — minutes on a
                    # cold or foreign-machine cache — must never reach
                    # the context rendezvous.  The barrier must be a
                    # COORDINATION-SERVICE one: a device-collective
                    # barrier would lazily create its own Gloo context
                    # under the same 30 s deadline and time out for the
                    # fast worker (see mesh.coordination_barrier).
                    # Harmless on TPU pods.
                    mh_step = step_fn.lower(
                        train_state, batch, jnp.float32(lr),
                        jnp.float32(loss_scale), step_rng).compile()
                    mesh_lib.coordination_barrier(
                        'pps_train_step_compiled')
                train_state, logs = (mh_step or step_fn)(
                    train_state, batch, jnp.float32(lr),
                    jnp.float32(loss_scale), step_rng)
                stats.IterToc()
                stats.UpdateIterStats(logs, mb_qsize=loader.qsize())
                # force a line on the last step of each epoch so short
                # triplet sub-epochs (4 steps at P8 on Market) always log
                stats.LogIterStats(global_step, lr, extra={'epoch': ep},
                                   force=(i == sched.epoch_len(ep) - 1))
                global_step += 1
                if stats.loss_is_nan():
                    loader._stop.set()
                    raise FloatingPointError('Loss is NaN')
                if preempt.is_set() or (preempt_sync is not None and
                                        preempt_sync(global_step)):
                    # checkpoint SYNCHRONOUSLY (the grace window is
                    # short; durability before exit beats overlap) and
                    # unwind.  train_state is this step's output — not
                    # yet donated, safe to fetch directly.
                    if saver_fut is not None:
                        saver_fut.result()
                        saver_fut = None
                    done_steps = i + 1
                    stem = 'model_preempt_epoch{}_step{}'.format(
                        ep, done_steps)
                    if cfg.TPU.CKPT_FORMAT == 'orbax':
                        ppath = os.path.join(output_dir, stem + '.orbax')
                        ckpt_lib.save_checkpoint_orbax(ppath, train_state,
                                                       cfg=cfg)
                        ckpt_lib.wait_for_orbax()
                    else:
                        ppath = os.path.join(output_dir, stem + '.pkl')
                        ckpt_lib.save_checkpoint(
                            ppath, model, train_state['params'],
                            train_state['state'],
                            opt_state=train_state['opt'], cfg=cfg)
                    logger.info('preemption requested: wrote %s (epoch '
                                '%d, %d/%d steps); exiting', ppath, ep,
                                done_steps, sched.epoch_len(ep))
                    raise Preempted(ep, done_steps, ppath)

            # per-epoch checkpoint (reference train.py:104-112; on
            # alternation epochs the reference `continue`s past the
            # checkpoint so shortened epochs are never snapshotted).
            # Written by a single background thread over a DEVICE COPY of
            # the state: the jitted step donates its input buffers
            # (TPU.DONATE), so the live pytree is invalidated by the next
            # step — the copies are never donated, letting the D2H fetch
            # + pickle overlap the next epoch's compute (the reference
            # blocked the GPUs for the whole save, utils/net.py:138).
            if ep % snapshot_period == 0 and not sched.is_triplet_epoch(ep):
                if cfg.TPU.CKPT_FORMAT == 'orbax':
                    # native sharded format: orbax's async save copies
                    # D2H synchronously (donation-safe) and streams the
                    # write in its own background threads
                    path = os.path.join(
                        output_dir, 'model_epoch{}.orbax'.format(ep + 1))
                    ckpt_lib.save_checkpoint_orbax(path, train_state,
                                                   cfg=cfg)
                else:
                    path = os.path.join(
                        output_dir, 'model_epoch{}.pkl'.format(ep + 1))
                    snap = jax.tree_util.tree_map(jnp.copy, train_state)
                    if saver_fut is not None:
                        saver_fut.result()  # surface errors; 1 in flight
                    saver_fut = saver.submit(
                        ckpt_lib.save_checkpoint, path, model,
                        snap['params'], snap['state'],
                        opt_state=snap['opt'], cfg=cfg)
                checkpoints[ep] = path

    finally:
        # let an in-flight snapshot finish (it is valid even when the
        # loop aborts, e.g. on a NaN loss) and reclaim the thread.  A
        # failed write is fatal on the normal path (the checkpoint dict
        # must not name files that were never written); when the loop is
        # already unwinding with its own exception, log it instead of
        # masking the root cause.  NB the unwinding check must happen
        # BEFORE calling result() — inside its except clause,
        # sys.exc_info() reports the caught saver error, not the outer
        # state.
        unwinding = sys.exc_info()[0] is not None
        if sig_installed:
            try:
                signal.signal(signal.SIGTERM,
                              signal.SIG_DFL if old_sig is None
                              else old_sig)
            except (ValueError, OSError):
                pass
        if saver_fut is not None:
            try:
                saver_fut.result()
            except Exception:
                saver.shutdown(wait=True)
                if not unwinding:
                    raise
                logger.exception('background checkpoint write failed')
        saver.shutdown(wait=True)
        if (profile_dir and
                profile_window[0] <= global_step <= profile_window[1]):
            # run ended (or aborted) inside/at the end of the trace window
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass  # no trace active (stopped at window end already)

    # model_final stays a reference-interop pkl in every format (it is
    # also the training-complete marker the auto-resume contract checks)
    ckpt_lib.wait_for_orbax()
    final_path = os.path.join(output_dir, 'model_final.pkl')
    ckpt_lib.save_checkpoint(final_path, model, train_state['params'],
                             train_state['state'],
                             opt_state=train_state['opt'], cfg=cfg)
    checkpoints['final'] = final_path
    return checkpoints
