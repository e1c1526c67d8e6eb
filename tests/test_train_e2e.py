"""End-to-end training smoke test on a synthetic dataset.

The analog of the reference's EXPECTED_RESULTS e2e contract
(reference task_evaluation.py:200-245): train a tiny model on a synthetic
identity dataset on the CPU mesh, assert the loss falls, the checkpoint
round-trips via auto-resume, and the inference path yields valid metrics.
"""

import json
import os

import numpy as np
import pytest

from pps_tpu.config import (cfg, merge_cfg_from_list, assert_and_infer_cfg,
                            reset_cfg)
from pps_tpu.data import catalog
from pps_tpu.data.json_dataset import combined_roidb_for_training
from pps_tpu.engine.train import train_model
from pps_tpu.engine import test as test_engine


def _write_coco(tmp_path, split, n_ids, per_id, with_marks=False):
    imdir = os.path.join(str(tmp_path), 'images')
    os.makedirs(imdir, exist_ok=True)
    images, annotations, categories = [], [], []
    for pid in range(1, n_ids + 1):
        categories.append({'id': pid, 'name': '{:08d}'.format(pid)})
        for j in range(per_id):
            iid = len(images) + 1
            cam = j % 2 + 1
            name = '{:08d}_{:04d}_{:08d}.jpg'.format(pid, cam, iid)
            images.append({'id': iid, 'file_name': name,
                           'width': 32, 'height': 96})
            ann = {'id': iid, 'image_id': iid, 'category_id': pid}
            if with_marks:
                # first image of each id = query, rest = gallery
                ann['mark'] = 0 if j == 0 else 1
            annotations.append(ann)
    ann_fn = os.path.join(str(tmp_path), split + '.json')
    with open(ann_fn, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    return imdir, ann_fn


def _class_decoder(n_ids):
    """Images whose content depends (noisily) on the identity, so the tiny
    net has signal to learn."""
    def decode(path):
        base = os.path.basename(path)
        pid = int(base[:8])
        iid = int(base.split('_')[-1].split('.')[0])
        rng = np.random.RandomState(iid)
        im = np.zeros((96, 32, 3), np.float32)
        # identity-specific horizontal band pattern
        prng = np.random.RandomState(pid)
        pattern = prng.randint(0, 255, size=(8, 4, 3)).astype(np.float32)
        im += np.kron(pattern, np.ones((12, 8, 1), np.float32))
        im += rng.randn(96, 32, 3) * 8.0
        return np.clip(im, 0, 255).astype(np.uint8)
    return decode


N_IDS = 8


@pytest.fixture
def tiny_train_cfg(tmp_path):
    imdir, ann_fn = _write_coco(tmp_path, 'trainval', N_IDS, 6)
    catalog.register_dataset('synth_trainval', imdir, ann_fn)
    imdir, ann_fn = _write_coco(tmp_path, 'test', N_IDS, 4, with_marks=True)
    catalog.register_dataset('synth_test', imdir, ann_fn)
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', str(N_IDS + 1),
        'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'TRAIN.FREEZE_AT', '0',
        'TRAIN.DATASETS', "('synth_trainval',)",
        'TRAIN.IMS_PER_BATCH', '8',
        'TRAIN.SNAPSHOT_ITERS', '1',
        'TEST.DATASETS', "('synth_test',)",
        'TEST.IMS_PER_BATCH', '4',
        'SOLVER.BASE_LR', '0.002',
        'SOLVER.LR_POLICY', 'steps_with_decay',
        'SOLVER.STEPS', '[0, 2]',
        'SOLVER.GAMMA', '0.5',
        'SOLVER.MAX_ITER', '3',
        'REID.SCALE', '(32, 96)',
        'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '16',
        'REID.CRM', 'True',
        'REID.TRIPLET_LOSS', 'True',
        'REID.TRIPLET_LOSS_CROSS', 'True',
        'REID.TRIPLET_LOSS_START', '0',
        'REID.NORMALIZE_FEATURE', 'True',
        'REID.MAX_AVE_FEATURE', 'True',
        'REID.P', '4',
        'REID.K', '2',
        'OUTPUT_DIR', str(tmp_path / 'out'),
    ])
    assert_and_infer_cfg(make_immutable=False)
    return cfg


def test_train_eval_resume(tiny_train_cfg, tmp_path, capsys, caplog):
    import logging
    c = tiny_train_cfg
    out_dir = str(tmp_path / 'out')
    decode = _class_decoder(N_IDS)

    caplog.set_level(logging.INFO, logger='pps_tpu.engine.train')
    ckpts = train_model(c, output_dir=out_dir, decode_fn=decode,
                        num_workers=2, log_period=1)
    # SOLVER.LOG_LR_CHANGE_THRESHOLD: the gamma=0.5 step at epoch 2
    # (ratio 2 > 1.1) logs independently of momentum scaling
    # (reference detector.py:506-515)
    assert any('Changing learning rate' in r.message
               for r in caplog.records)
    # iter-timer reset at start + LOG_PERIOD sheds compile outliers from
    # time/ETA (reference utils/train.py:116-119)
    assert any('Resetting iteration timer' in r.message
               for r in caplog.records)
    assert 'final' in ckpts
    assert os.path.exists(ckpts['final'])
    # epoch snapshots saved with reference naming (epoch 3 is triplet-odd
    # with TRIPLET_LOSS_START=0... epochs 1,2 land as model_epoch{N}.pkl)
    assert any(k != 'final' for k in ckpts)

    # json_stats lines were emitted and parse
    captured = capsys.readouterr().out
    stat_lines = [l for l in captured.splitlines()
                  if l.startswith('json_stats: ')]
    assert stat_lines
    first = json.loads(stat_lines[0][len('json_stats: '):])
    last = json.loads(stat_lines[-1][len('json_stats: '):])
    assert 'loss' in first and 'lr' in first and 'epoch' in first
    assert float(last['loss']) < float(first['loss'])

    # inference + evaluation end-to-end
    feats, roidb = test_engine.test_net(
        c, ckpts['final'], 'synth_test', output_dir=out_dir,
        decode_fn=decode)
    assert feats.shape[0] == len(roidb)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                               rtol=1e-4)
    results = test_engine.evaluate_dataset(c, feats, roidb)
    assert 0.0 <= results['single']['mAP'] <= 1.0
    assert 0.0 <= results['single']['cmc1'] <= 1.0
    assert os.path.exists(os.path.join(out_dir, 'features.pkl'))

    # auto-resume: with model_final.pkl present training is skipped
    ckpts2 = train_model(c, output_dir=out_dir, decode_fn=decode)
    assert list(ckpts2) == ['final']


def test_resume_from_epoch(tiny_train_cfg, tmp_path):
    c = tiny_train_cfg
    decode = _class_decoder(N_IDS)
    out_dir = str(tmp_path / 'resume')

    # train only epoch 0, interrupt by setting MAX_ITER=1
    c.SOLVER.MAX_ITER = 1
    train_model(c, output_dir=out_dir, decode_fn=decode, num_workers=1)
    os.remove(os.path.join(out_dir, 'model_final.pkl'))
    assert os.path.exists(os.path.join(out_dir, 'model_epoch1.pkl'))

    # resume and finish 2 more epochs
    c.SOLVER.MAX_ITER = 2
    ckpts = train_model(c, output_dir=out_dir, decode_fn=decode,
                        num_workers=1)
    assert os.path.exists(ckpts['final'])


def test_train_bitwise_deterministic(tiny_train_cfg, tmp_path):
    """Two runs with the same seed produce bitwise-identical checkpoints
    (pure schedule + per-batch augmentation rng + deterministic jit)."""
    c = tiny_train_cfg
    c.SOLVER.MAX_ITER = 1
    decode = _class_decoder(N_IDS)

    def run(out):
        ck = train_model(c, output_dir=str(tmp_path / out),
                         decode_fn=decode, num_workers=3)
        from pps_tpu.utils.io import load_object
        return load_object(ck['final'])['blobs']

    b1 = run('d1')
    b2 = run('d2')
    assert sorted(b1) == sorted(b2)
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k], err_msg=k)


def test_bf16_wire_dtype(tiny_train_cfg, tmp_path):
    """TPU.WIRE_DTYPE=bfloat16 trains to a sane loss (transfer-precision
    option; not bit-parity with the f32 wire)."""
    c = tiny_train_cfg
    c.SOLVER.MAX_ITER = 1
    c.TPU.WIRE_DTYPE = 'bfloat16'
    decode = _class_decoder(N_IDS)
    out = str(tmp_path / 'bf16wire')
    ck = train_model(c, output_dir=out, decode_fn=decode, num_workers=1)
    assert os.path.exists(ck['final'])


def test_orbax_snapshot_resume(tiny_train_cfg, tmp_path):
    """TPU.CKPT_FORMAT=orbax: epoch snapshots are native sharded orbax
    directories, auto-resume restores from them, and model_final stays a
    reference-interop pkl."""
    c = tiny_train_cfg
    c.TPU.CKPT_FORMAT = 'orbax'
    decode = _class_decoder(N_IDS)
    out_dir = str(tmp_path / 'orbax_run')

    c.SOLVER.MAX_ITER = 1
    train_model(c, output_dir=out_dir, decode_fn=decode, num_workers=1)
    epoch_dir = os.path.join(out_dir, 'model_epoch1.orbax')
    assert os.path.isdir(epoch_dir)
    assert os.path.exists(os.path.join(out_dir, 'model_final.pkl'))

    # the orbax tree round-trips (params match the pkl final after 1 ep)
    from pps_tpu.engine import checkpoint as ckpt_lib
    ts = ckpt_lib.load_checkpoint_orbax(epoch_dir)
    assert 'params' in ts and 'state' in ts and 'opt' in ts

    os.remove(os.path.join(out_dir, 'model_final.pkl'))
    c.SOLVER.MAX_ITER = 2
    ckpts = train_model(c, output_dir=out_dir, decode_fn=decode,
                        num_workers=1)
    assert os.path.exists(ckpts['final'])

    # eval loads the orbax snapshot directly (engine/test.py weights path)
    from pps_tpu.models.model import build_model
    feats = None
    import jax
    model = build_model(c)
    p0, s0 = model.init(jax.random.PRNGKey(0))
    ts2 = ckpt_lib.load_checkpoint_orbax(epoch_dir)
    x = np.zeros((2, 96, 32, 3), np.float32)
    feats = np.asarray(model.extract_features(
        ts2['params'], ts2['state'], x))
    assert np.isfinite(feats).all()


def test_resume_bitwise_equals_continuous(tiny_train_cfg, tmp_path):
    """An interrupted-and-resumed run produces the SAME final checkpoint
    as a continuous run: the loader plan is a pure function of the epoch
    and the per-step PRNG is fold_in(base, global_step), so nothing in
    the stream depends on where the process boundary fell."""
    from pps_tpu.utils.io import load_object
    c = tiny_train_cfg
    decode = _class_decoder(N_IDS)

    c.SOLVER.MAX_ITER = 2
    train_model(c, output_dir=str(tmp_path / 'cont'), decode_fn=decode,
                num_workers=1)
    cont = load_object(os.path.join(str(tmp_path / 'cont'),
                                    'model_final.pkl'))['blobs']

    out2 = str(tmp_path / 'split')
    c.SOLVER.MAX_ITER = 1
    train_model(c, output_dir=out2, decode_fn=decode, num_workers=1)
    os.remove(os.path.join(out2, 'model_final.pkl'))
    c.SOLVER.MAX_ITER = 2
    train_model(c, output_dir=out2, decode_fn=decode, num_workers=1)
    split = load_object(os.path.join(out2, 'model_final.pkl'))['blobs']

    assert sorted(cont) == sorted(split)
    for k in cont:
        np.testing.assert_array_equal(cont[k], split[k], err_msg=k)


def test_find_resume_checkpoint_prefers_furthest(tmp_path):
    """(epoch, step) tuple order: a mid-epoch preempt checkpoint outranks
    the epoch snapshot it follows and loses to the next epoch snapshot."""
    from pps_tpu.engine import checkpoint as ckpt_lib
    d = str(tmp_path)
    for name in ['model_epoch2.pkl', 'model_preempt_epoch1_step7.pkl',
                 'model_preempt_epoch2_step5.pkl']:
        open(os.path.join(d, name), 'wb').close()
    path, ep, st = ckpt_lib.find_resume_checkpoint(d)
    assert os.path.basename(path) == 'model_preempt_epoch2_step5.pkl'
    assert (ep, st) == (2, 5)
    open(os.path.join(d, 'model_epoch3.pkl'), 'wb').close()
    path, ep, st = ckpt_lib.find_resume_checkpoint(d)
    assert os.path.basename(path) == 'model_epoch3.pkl'
    assert (ep, st) == (3, 0)


def test_preempt_midepoch_resume_bitwise(tiny_train_cfg, tmp_path):
    """Preemption mid-epoch: the loop checkpoints after the in-flight
    step and raises Preempted; auto-resume continues from the exact step
    and the final state is bitwise equal to a continuous run (full-epoch
    planning keeps sampler state identical; per-step PRNG is
    fold_in(base, global_step))."""
    from pps_tpu.data.sampler import EpochSchedule
    from pps_tpu.engine import train as train_lib
    from pps_tpu.utils.io import load_object
    c = tiny_train_cfg
    c.SOLVER.MAX_ITER = 2
    decode = _class_decoder(N_IDS)

    train_model(c, output_dir=str(tmp_path / 'cont'), decode_fn=decode,
                num_workers=1)
    cont = load_object(os.path.join(str(tmp_path / 'cont'),
                                    'model_final.pkl'))['blobs']

    from _mh_train_common import PreemptAfterSteps as AfterSteps

    out = str(tmp_path / 'pre')
    with pytest.raises(train_lib.Preempted) as ei:
        train_model(c, output_dir=out, decode_fn=decode, num_workers=1,
                    preempt_event=AfterSteps(3))
    assert ei.value.step == 3
    assert os.path.basename(ei.value.path) == \
        'model_preempt_epoch{}_step3.pkl'.format(ei.value.epoch)
    assert os.path.exists(ei.value.path)
    # the preemption really fell MID-epoch (the new resume path)
    roidb, _ = combined_roidb_for_training(c.TRAIN.DATASETS,
                                           use_flipped=c.TRAIN.USE_FLIPPED)
    sched = EpochSchedule(c, len(roidb),
                          len({e['gt_class'] for e in roidb}))
    assert 0 < ei.value.step < sched.epoch_len(ei.value.epoch)

    train_model(c, output_dir=out, decode_fn=decode, num_workers=1)
    split = load_object(os.path.join(out, 'model_final.pkl'))['blobs']
    assert sorted(cont) == sorted(split)
    for k in cont:
        np.testing.assert_array_equal(cont[k], split[k], err_msg=k)


def test_preempt_orbax_format(tiny_train_cfg, tmp_path):
    """TPU.CKPT_FORMAT=orbax: the preemption checkpoint is a durable
    orbax directory (written + committed before exit) and auto-resume
    restores it mid-epoch."""
    from pps_tpu.engine import train as train_lib
    c = tiny_train_cfg
    c.TPU.CKPT_FORMAT = 'orbax'
    c.SOLVER.MAX_ITER = 2
    decode = _class_decoder(N_IDS)

    from _mh_train_common import PreemptAfterSteps as AfterSteps

    out = str(tmp_path / 'pre_orbax')
    with pytest.raises(train_lib.Preempted) as ei:
        train_model(c, output_dir=out, decode_fn=decode, num_workers=1,
                    preempt_event=AfterSteps(2))
    assert ei.value.path.endswith('.orbax')
    assert os.path.isdir(ei.value.path)

    ck = train_model(c, output_dir=out, decode_fn=decode, num_workers=1)
    assert os.path.exists(ck['final'])


def test_sigterm_preempts_training(tiny_train_cfg, tmp_path):
    """The real signal path: SIGTERM mid-run checkpoints and raises
    Preempted, and the previous handler is restored afterwards."""
    import signal
    import threading
    from pps_tpu.engine import train as train_lib
    c = tiny_train_cfg
    c.SOLVER.MAX_ITER = 3
    decode = _class_decoder(N_IDS)
    out = str(tmp_path / 'sig')

    def outer(signum, frame):  # safety net; should never fire
        pass
    old = signal.signal(signal.SIGTERM, outer)
    try:
        # deliver SIGTERM the moment train_model installs its handler
        # (sending on a fixed timer races model build/compile: a signal
        # arriving before the install lands in `outer` and is lost)
        def fire_when_armed():
            import time
            while (signal.getsignal(signal.SIGTERM)
                   is not train_lib.request_preemption):
                time.sleep(0.02)
            os.kill(os.getpid(), signal.SIGTERM)
        w = threading.Thread(target=fire_when_armed, daemon=True)
        w.start()
        with pytest.raises(train_lib.Preempted) as ei:
            train_model(c, output_dir=out, decode_fn=decode,
                        num_workers=1)
        w.join(timeout=10)
        assert os.path.exists(ei.value.path)
        # train_model restored the handler it displaced
        assert signal.getsignal(signal.SIGTERM) is outer
    finally:
        signal.signal(signal.SIGTERM, old)


def test_freeze_at_params_bit_frozen(tiny_train_cfg, tmp_path):
    """TRAIN.FREEZE_AT=2: params at/below the freeze point are bitwise
    unchanged after training (no weight-decay drift, zero momentum), BN
    running stats of frozen stages still update (the reference's
    computed-blob semantics), and stages above the freeze point train
    (reference ResNet.py:104-106 + optimizer.py:90-157)."""
    import jax
    from pps_tpu.engine import checkpoint as ckpt_lib
    from pps_tpu.models.model import build_model
    from pps_tpu.utils.io import load_object

    c = tiny_train_cfg
    c.TRAIN.FREEZE_AT = 2
    c.SOLVER.MAX_ITER = 1
    decode = _class_decoder(N_IDS)
    out = str(tmp_path / 'freeze2')

    model = build_model(c)
    params0, state0 = model.init(jax.random.PRNGKey(c.RNG_SEED))
    blobs0 = ckpt_lib.params_to_blobs(model, params0, state0)

    ck = train_model(c, output_dir=out, decode_fn=decode, num_workers=1)
    blobs = load_object(ck['final'])['blobs']

    frozen = [k for k in blobs0
              if k.startswith(('conv1', 'res_conv1_bn', 'res2_'))
              and not k.endswith(('_bn_rm', '_bn_riv'))]
    assert frozen
    for k in frozen:
        np.testing.assert_array_equal(blobs[k], blobs0[k], err_msg=k)
        np.testing.assert_array_equal(
            blobs[k + '_momentum'], np.zeros_like(blobs0[k]), err_msg=k)

    stats = [k for k in blobs0
             if k.startswith('res2_') and k.endswith('_bn_rm')]
    assert stats and any(
        not np.array_equal(blobs[k], blobs0[k]) for k in stats)

    above = [k for k in blobs0
             if k.startswith('res3_') and k.endswith('_w')]
    assert above and all(
        not np.array_equal(blobs[k], blobs0[k]) for k in above)


def test_freeze_conv_body_step(tiny_train_cfg):
    """TRAIN.FREEZE_CONV_BODY: the whole conv body is bit-frozen through
    the real mesh-sharded train step; heads still train (reference
    model_builder.py:255-257)."""
    import jax
    import jax.numpy as jnp
    from pps_tpu.models.model import build_model
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel import train_step as ts_lib
    from pps_tpu.solver import optimizer as opt_lib

    c = tiny_train_cfg
    c.TRAIN.FREEZE_CONV_BODY = True
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(0))
    meta = opt_lib.make_param_meta(params, c)
    trainable = opt_lib.trainable_from_cfg(c, params)
    assert trainable is not None and not trainable['conv1_w']
    opt = opt_lib.init_opt_state(params)
    mesh = mesh_lib.build_mesh(c)
    step = ts_lib.make_train_step(model, c, mesh, meta=meta,
                                  trainable=trainable, donate=False)

    b = c.TRAIN.IMS_PER_BATCH
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(c.REID.P), c.REID.K).astype(np.int32)
    oh = np.zeros((b, c.MODEL.NUM_CLASSES - 1), np.float32)
    oh[np.arange(b), labels] = 1.0
    batch = {'data': rng.randn(b, 96, 32, 3).astype(np.float32) * 20,
             'labels_int32': labels, 'labels_oh': oh}
    with mesh:
        ts = ts_lib.place_train_state(
            mesh, {'params': params, 'state': state, 'opt': opt})
        dev_b = ts_lib.shard_batch(mesh, batch)
        for i in range(2):
            ts, _ = step(ts, dev_b, jnp.float32(0.01), jnp.float32(1.0),
                         jax.random.PRNGKey(i))

    body = [k for k in params
            if k.startswith(('conv1', 'res_conv1_bn', 'res2_', 'res3_',
                             'res4_', 'res5_'))]
    assert body
    for k in body:
        np.testing.assert_array_equal(
            np.asarray(ts['params'][k]), np.asarray(params[k]), err_msg=k)
        np.testing.assert_array_equal(
            np.asarray(ts['opt']['momentum'][k]),
            np.zeros_like(np.asarray(params[k])), err_msg=k)
    hp = model.head_param_prefix + '_fc_w'
    assert not np.array_equal(np.asarray(ts['params'][hp]),
                              np.asarray(params[hp]))


def test_preserved_blobs_roundtrip(tiny_train_cfg, tmp_path):
    """A weights file carrying blobs the model does not use survives
    load -> train -> save losslessly (reference utils/net.py:122-178
    '__preserve__/' namescope): alien blobs re-emitted bitwise, live
    model blobs taking precedence on a name collision."""
    import jax
    from pps_tpu.models.model import build_model
    from pps_tpu.engine import checkpoint as ckpt_lib
    from pps_tpu.utils.io import load_object, save_object

    c = tiny_train_cfg
    c.SOLVER.MAX_ITER = 1
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(3))
    boot = str(tmp_path / 'bootstrap.pkl')
    ckpt_lib.save_checkpoint(boot, model, params, state, cfg=c)

    # inject blobs no model matches (e.g. another training stage's heads,
    # the reference's alternating-optimization use case) + a stale
    # momentum blob, which must NOT be preserved (reference excludes it)
    rng = np.random.RandomState(11)
    alien = {'stage2_rpn_conv_w': rng.randn(4, 4, 3, 3).astype(np.float32),
             'stage2_rpn_conv_b': rng.randn(4).astype(np.float32)}
    payload = load_object(boot)
    payload['blobs'].update(alien)
    payload['blobs']['stage2_rpn_conv_w_momentum'] = np.zeros(
        (4, 4, 3, 3), np.float32)
    save_object(payload, boot)

    c.TRAIN.WEIGHTS = boot
    out_dir = str(tmp_path / 'preserve_run')
    ckpts = train_model(c, output_dir=out_dir,
                        decode_fn=_class_decoder(N_IDS), num_workers=1)

    final = load_object(ckpts['final'])['blobs']
    for name, arr in alien.items():
        np.testing.assert_array_equal(final[name], arr, err_msg=name)
    assert 'stage2_rpn_conv_w_momentum' not in final
    # training actually updated live blobs (preservation isn't a no-op
    # passthrough of the whole input file)
    hp = model.head_param_prefix + '0_fc_w'
    assert not np.array_equal(final[hp],
                              load_object(boot)['blobs'][hp])
