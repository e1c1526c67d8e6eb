"""BN-folding parity: folded params produce identical embeddings."""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
from pps_tpu.models.folding import fold_conv_bn
from pps_tpu.models.model import build_model


def test_fold_conv_bn_parity():
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'RESNETS.RES5_STRIDE', '1',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '8', 'REID.NORMALIZE_FEATURE', 'True'])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    for k in list(state):
        if k.endswith('_rm'):
            state[k] = jnp.asarray(
                rng.randn(*state[k].shape).astype('f4') * 0.1)
        if k.endswith('_riv'):
            state[k] = jnp.asarray(
                rng.rand(*state[k].shape).astype('f4') + 0.5)
    x = jnp.asarray(rng.randn(2, 96, 32, 3).astype('f4') * 50)
    base = np.asarray(model.extract_features(params, state, x))
    folded = fold_conv_bn(params, state)
    assert 'conv1_fb' in folded and 'res2_0_branch2a_fb' in folded
    out = np.asarray(model.extract_features(folded, state, x))
    np.testing.assert_allclose(base, out, rtol=1e-3, atol=1e-4)
