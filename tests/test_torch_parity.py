"""Independent cross-check: a torch (CPU) mirror of the reference operator
semantics, fed from a checkpoint written by our framework.

The mirror itself lives in pps_tpu/evaluation/torch_mirror.py (shared with
tools/e2e_parity.py); see its module docstring for why a match validates
both the model math and the checkpoint name/layout mapping.
"""

import numpy as np
import pytest

import jax

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.engine import checkpoint as ckpt_lib
from pps_tpu.evaluation.torch_mirror import torch_reference_forward
from pps_tpu.models.model import build_model


@pytest.fixture
def small_pps_cfg():
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '11',
        'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'TRAIN.FREEZE_AT', '0',
        'REID.SCALE', '(32, 96)',
        'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '16',
        'REID.NORMALIZE_FEATURE', 'True',
        'REID.MAX_AVE_FEATURE', 'True',
    ])
    assert_and_infer_cfg(make_immutable=False)
    return cfg


def test_embedding_matches_torch_reference(small_pps_cfg, tmp_path):
    c = small_pps_cfg
    model = build_model(c)
    params, state = model.init(jax.random.PRNGKey(7))
    # randomize BN stats so eval-mode BN is non-trivial
    rng = np.random.RandomState(0)
    for k in list(state):
        if k.endswith('_rm'):
            state[k] = jax.numpy.asarray(
                rng.randn(*state[k].shape).astype(np.float32) * 0.1)
        if k.endswith('_riv'):
            state[k] = jax.numpy.asarray(
                rng.rand(*state[k].shape).astype(np.float32) + 0.5)

    path = str(tmp_path / 'parity.pkl')
    ckpt_lib.save_checkpoint(path, model, params, state, cfg=c)
    from pps_tpu.utils.io import load_object
    blobs = {k: np.asarray(v) for k, v in load_object(path)['blobs'].items()}

    images = rng.randn(3, 96, 32, 3).astype(np.float32) * 50.0

    ours = np.asarray(model.extract_features(
        params, state, jax.numpy.asarray(images)))
    theirs, _ = torch_reference_forward(
        blobs, np.transpose(images, (0, 3, 1, 2)).copy(),
        strip_num=3, splits=model.head_spec['splits'])

    assert ours.shape == theirs.shape == (3, model.embedding_dim)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)
