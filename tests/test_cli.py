"""CLI driver smoke test: the real tools/train_net.py end-to-end.

Runs the actual CLI in a subprocess (CPU mesh) against a tiny on-disk
dataset wired through $PPS_TPU_DATA_DIR, covering the contracts the
library-level tests bypass: cfg freeze on the driver path, the
get_output_dir train/test directory convention (reference
utils/train.py:144, test_engine.py:108), yaml parsing, and the
train -> test-final -> test-snapshots flow (reference
tools/train_net.py:87-128).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_IDS = 4


def _write_images_and_json(data_dir):
    """Lay out <data_dir>/market1501/{images,trainval.json,test.json}
    with REAL png files (identity-banded content + noise)."""
    base = os.path.join(data_dir, 'market1501')
    imdir = os.path.join(base, 'images')
    os.makedirs(imdir, exist_ok=True)

    def synth(pid, iid):
        prng = np.random.RandomState(pid)
        pattern = prng.randint(0, 255, size=(8, 4, 3)).astype(np.float32)
        im = np.kron(pattern, np.ones((12, 8, 1), np.float32))
        im += np.random.RandomState(iid).randn(96, 32, 3) * 8.0
        return np.clip(im, 0, 255).astype(np.uint8)

    next_iid = [1]

    def split(per_id, with_marks):
        images, annotations, categories = [], [], []
        for pid in range(1, N_IDS + 1):
            categories.append({'id': pid, 'name': '{:08d}'.format(pid)})
            for j in range(per_id):
                iid = next_iid[0]
                next_iid[0] += 1
                cam = j % 2 + 1
                name = '{:08d}_{:04d}_{:08d}.png'.format(pid, cam, iid)
                cv2.imwrite(os.path.join(imdir, name), synth(pid, iid))
                images.append({'id': iid, 'file_name': name,
                               'width': 32, 'height': 96})
                ann = {'id': iid, 'image_id': iid, 'category_id': pid}
                if with_marks:
                    ann['mark'] = 0 if j == 0 else 1
                annotations.append(ann)
        return {'images': images, 'annotations': annotations,
                'categories': categories}

    with open(os.path.join(base, 'trainval.json'), 'w') as f:
        json.dump(split(4, False), f)
    with open(os.path.join(base, 'test.json'), 'w') as f:
        json.dump(split(3, True), f)


CFG_YAML = """\
MODEL:
  TYPE: generalized_reid
  CONV_BODY: ResNet.add_ResNet50_conv5_body
  NUM_CLASSES: {nc}
  USE_BN: True
FAST_RCNN:
  ROI_BOX_HEAD: pps_heads.add_pps_part_head
RESNETS:
  RES5_STRIDE: 1
TRAIN:
  FREEZE_AT: 0
  DATASETS: ('market1501_trainval',)
  IMS_PER_BATCH: 8
  SNAPSHOT_ITERS: 1
TEST:
  DATASETS: ('market1501_test',)
  IMS_PER_BATCH: 2
SOLVER:
  BASE_LR: 0.001
  LR_POLICY: steps_with_decay
  STEPS: [0]
  MAX_ITER: 1
  WARM_UP_ITERS: 0
REID:
  SCALE: (32, 96)
  BPM_STRIP_NUM: 3
  BPM_DIM: 16
  RERANK: False
DATA_LOADER:
  NUM_THREADS: 1
"""


def test_train_net_cli(tmp_path):
    _write_images_and_json(str(tmp_path / 'data'))
    cfg_file = str(tmp_path / 'tiny.yaml')
    with open(cfg_file, 'w') as f:
        f.write(CFG_YAML.format(nc=N_IDS + 1))
    out_dir = str(tmp_path / 'out')

    env = dict(os.environ)
    env['PPS_TPU_DATA_DIR'] = str(tmp_path / 'data')
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'tools', 'train_net.py'),
         '--cfg', cfg_file, 'OUTPUT_DIR', out_dir],
        capture_output=True, text=True, timeout=540, cwd=ROOT, env=env)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out

    # get_output_dir convention: checkpoints under train/<dataset>/,
    # eval artifacts under test/<dataset>/
    train_dir = os.path.join(out_dir, 'train', 'market1501_trainval')
    test_dir = os.path.join(out_dir, 'test', 'market1501_test')
    assert os.path.exists(os.path.join(train_dir, 'model_final.pkl')), out
    assert os.path.exists(os.path.join(train_dir, 'model_epoch1.pkl')), out
    assert os.path.exists(os.path.join(test_dir, 'features.pkl')), out

    # the log-format APIs: json_stats lines + evaluator metric lines
    assert 'json_stats: ' in out
    assert '[mAP:' in out
    # final AND snapshot both tested (reverse-epoch sweep)
    assert out.count('reprint snapshot name for the result') >= 2


def test_cli_cfg_frozen_after_startup():
    """assert_and_infer_cfg() freezes: a stray assignment raises (the
    immutability contract the drivers now engage, reference
    config.py:1165-1180)."""
    from pps_tpu.config import (cfg, merge_cfg_from_list,
                                assert_and_infer_cfg)
    merge_cfg_from_list(['MODEL.TYPE', 'generalized_reid',
                         'MODEL.NUM_CLASSES', '5'])
    assert_and_infer_cfg()
    with pytest.raises(AttributeError):
        cfg.REID.K = 5
    cfg.immutable(False)


def test_parity_check_cli(tmp_path):
    """tools/parity_check.py: side-by-side oracle/numpy/device metrics
    from a features.pkl + dataset (no images needed — features given),
    exit 0 with PARITY OK on self-consistent inputs."""
    import pickle

    base = tmp_path / 'data' / 'market1501'
    os.makedirs(str(base), exist_ok=True)
    rng = np.random.RandomState(3)
    n_ids, per_id, d = 6, 6, 32
    images, annotations, categories = [], [], []
    feats = []
    centers = rng.randn(n_ids, d)
    iid = 0
    for pid in range(1, n_ids + 1):
        categories.append({'id': pid, 'name': '{:08d}'.format(pid)})
        for j in range(per_id):
            iid += 1
            cam = j % 3 + 1
            name = '{:08d}_{:04d}_{:08d}.png'.format(pid, cam, iid)
            images.append({'id': iid, 'file_name': name,
                           'width': 32, 'height': 96})
            # 1 query, 1 multi-query extra, rest gallery per id
            mark = 0 if j == 0 else (2 if j == 1 else 1)
            annotations.append({'id': iid, 'image_id': iid,
                                'category_id': pid, 'mark': mark})
            f = centers[pid - 1] + 0.6 * rng.randn(d)
            feats.append(f / np.linalg.norm(f))
    with open(str(base / 'test.json'), 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    with open(str(base / 'trainval.json'), 'w') as f:
        json.dump({'images': [], 'annotations': [], 'categories': []}, f)
    feat_file = str(tmp_path / 'features.pkl')
    with open(feat_file, 'wb') as f:
        # the reference features.pkl container (test_engine.py:356-368)
        pickle.dump({'all_feats': np.stack(feats).astype(np.float32)}, f)

    env = dict(os.environ)
    env['PPS_TPU_DATA_DIR'] = str(tmp_path / 'data')
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'tools', 'parity_check.py'),
         '--dataset', 'market1501_test', '--features', feat_file],
        capture_output=True, text=True, timeout=420, cwd=ROOT, env=env)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert 'PARITY OK' in out, out
    assert 'reference-oracle' in out and 'ours-device' in out, out
    for block in ('single/mAP', 'multi/mAP', 'single_rerank/mAP',
                  'multi_rerank/mAP'):
        assert block in out, out


def test_retrieve_cli_int8_gallery(tmp_path):
    """tools/retrieve.py serving CLI: embed a gallery dir, answer a query
    with the int8-quantized device gallery, print ranked matches."""
    _write_images_and_json(str(tmp_path / 'data'))
    imdir = str(tmp_path / 'data' / 'market1501' / 'images')
    cfg_file = str(tmp_path / 'tiny.yaml')
    with open(cfg_file, 'w') as f:
        f.write(CFG_YAML.format(nc=N_IDS + 1))

    # random-init checkpoint (retrieval ranking needs no training to
    # smoke the CLI contract)
    env = dict(os.environ)
    env['PPS_TPU_DATA_DIR'] = str(tmp_path / 'data')
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    ckpt = str(tmp_path / 'model.pkl')
    mk = ("import jax; jax.config.update('jax_platforms','cpu');"
          "from pps_tpu.config import cfg, merge_cfg_from_file,"
          "assert_and_infer_cfg;"
          "merge_cfg_from_file(r'%s'); assert_and_infer_cfg("
          "make_immutable=False);"
          "from pps_tpu.models.model import build_model;"
          "from pps_tpu.engine.checkpoint import save_checkpoint;"
          "m = build_model(cfg); p, s = m.init(jax.random.PRNGKey(0));"
          "save_checkpoint(r'%s', m, p, s)" % (cfg_file, ckpt))
    proc = subprocess.run([sys.executable, '-c', mk], capture_output=True,
                          text=True, timeout=300, cwd=ROOT, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    query = sorted(os.listdir(imdir))[0]
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'tools', 'retrieve.py'),
         '--cfg', cfg_file, '--weights', ckpt, '--gallery', imdir,
         '--query', os.path.join(imdir, query), '--topk', '3',
         '--int8-gallery'],
        capture_output=True, text=True, timeout=540, cwd=ROOT, env=env)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    assert 'query: ' in out and '#1' in out, out
    # top hit of a query that is itself in the gallery must be itself
    # (self-distance ~0 survives int8 gallery quantization)
    first = [l for l in out.splitlines() if '#1' in l][0]
    assert query in first, out
    assert os.path.exists(os.path.join(imdir, 'gallery_features.npz'))

    # --shard-gallery + --rerank + --save-index: row-shard over the
    # 8-device mesh, k-reciprocal re-rank the shortlist (self-match must
    # survive re-ranking), persist the placed index
    idx_file = str(tmp_path / 'index.npz')
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'tools', 'retrieve.py'),
         '--cfg', cfg_file, '--weights', ckpt, '--gallery', imdir,
         '--query', os.path.join(imdir, query), '--topk', '3',
         '--int8-gallery', '--shard-gallery',
         '--rerank', '--rerank-shortlist', '8',
         '--save-index', idx_file],
        capture_output=True, text=True, timeout=540, cwd=ROOT, env=env)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    first = [l for l in out.splitlines() if '#1' in l][0]
    assert query in first, out
    assert os.path.exists(idx_file)

    # --load-index with no --gallery: the persisted rows answer directly
    # (no re-embed; int8-ness travels with the file)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, 'tools', 'retrieve.py'),
         '--cfg', cfg_file, '--weights', ckpt,
         '--query', os.path.join(imdir, query), '--topk', '3',
         '--load-index', idx_file],
        capture_output=True, text=True, timeout=540, cwd=ROOT, env=env)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out
    first = [l for l in out.splitlines() if '#1' in l][0]
    assert query in first, out
