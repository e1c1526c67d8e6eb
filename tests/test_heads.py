"""Head semantics tests: strip splits, combination order, pooling math."""

import jax
import jax.numpy as jnp
import numpy as np

from pps_tpu.config import cfg
from pps_tpu.models import heads


def test_strip_splits_uneven_tables():
    # flagship: 5 strips at input height 384, res5 stride 1 -> 1/16 scale
    assert heads.strip_splits(5, 384, 1.0 / 16) == [5, 5, 4, 5, 5]
    assert heads.strip_splits(7, 384, 1.0 / 16) == [3, 3, 4, 4, 4, 3, 3]
    assert heads.strip_splits(9, 384, 1.0 / 16) == [2, 3, 3, 3, 3, 3, 3, 2, 2]
    assert heads.strip_splits(10, 384, 1.0 / 16) == [
        2, 2, 2, 3, 3, 3, 3, 2, 2, 2]
    # uniform fallback
    assert heads.strip_splits(6, 384, 1.0 / 16) == [4] * 6
    assert heads.strip_splits(3, 384, 1.0 / 16) == [8] * 3


def test_powerset_combo_order():
    """Order must match the reference bitmask loop (pps_heads.py:47-52)."""
    combos = heads.powerset_combos(3)
    assert [m for _, m in combos] == [
        (0,), (1,), (0, 1), (2,), (0, 2), (1, 2), (0, 1, 2)]
    assert [p for p, _ in combos] == [
        'pps0', 'pps1', 'pps01', 'pps2', 'pps02', 'pps12', 'pps012']
    assert len(heads.powerset_combos(5)) == 31


def test_youtu_combos():
    combos = heads.youtu_combos(3)
    # level 3 (3 singles), level 2 (2 pairs), level 1 (1 triple)
    assert [m for _, m in combos] == [
        (0,), (1,), (2,), (0, 1), (1, 2), (0, 1, 2)]
    assert combos[0][0] == 'youtu30'
    assert combos[-1][0] == 'youtu10'


def test_strip_pools_and_combine():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 12, 8, 4).astype(np.float32)
    splits = [5, 4, 3]
    ave, mx = heads.strip_pools(jnp.asarray(feat), splits)
    assert ave.shape == (2, 3, 4)
    np.testing.assert_allclose(
        np.asarray(ave[:, 0]), feat[:, :5].mean(axis=(1, 2)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mx[:, 2]), feat[:, 9:12].max(axis=(1, 2)), atol=1e-6)

    spec = {'strip_num': 3, 'combos': heads.powerset_combos(3)}
    masks = heads.combo_masks(spec)
    cf = heads.combine_strips(ave, mx, masks, 'mean_max')
    assert cf.shape == (2, 7, 4)
    # combo (0,1) = Mean(ave0, ave1) + Max(max0, max1)
    want = (np.asarray(ave)[:, :2].mean(1) +
            np.maximum(np.asarray(mx)[:, 0], np.asarray(mx)[:, 1]))
    np.testing.assert_allclose(np.asarray(cf[:, 2]), want, atol=1e-6)
    # 'max' mode: Max of member *ave* pools (pps_heads.py:70-76)
    cf2 = heads.combine_strips(ave, mx, masks, 'max')
    want2 = np.maximum(np.asarray(ave)[:, 0], np.asarray(ave)[:, 1])
    np.testing.assert_allclose(np.asarray(cf2[:, 2]), want2, atol=1e-6)


def test_head_apply_shapes_and_bn():
    from pps_tpu import config as core_config
    core_config.merge_cfg_from_list([
        'MODEL.NUM_CLASSES', '11', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '16', 'FAST_RCNN.ROI_BOX_HEAD',
        'pps_heads.add_pps_part_head', 'REID.MAX_AVE_FEATURE', 'True',
        'REID.DROPOUT_FEATURE', 'True', 'MODEL.USE_BN', 'True',
    ])
    spec = heads.head_spec(cfg, 1.0 / 16)
    assert len(spec['combos']) == 7
    params, state = heads.init_head_params(
        jax.random.PRNGKey(0), spec, dim_in=32)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 7, 32),
                    jnp.float32)
    feats, logits, upd = heads.apply_head(
        params, state, x, spec, train=True,
        dropout_rng=jax.random.PRNGKey(1))
    assert feats.shape == (8, 7, 16)
    assert logits.shape == (8, 7, 10)
    assert set(upd) == {'reid_bn_rm', 'reid_bn_riv'}
    assert np.all(np.asarray(feats) >= 0)  # post-ReLU

    # eval mode uses running stats, no updates
    feats_e, logits_e, upd_e = heads.apply_head(
        params, state, x, spec, train=False)
    assert upd_e == {}


def test_crm_probs_are_probabilities():
    spec = {'bpm_dim': 16, 'num_logits': 10}
    params = heads.init_crm_params(jax.random.PRNGKey(0), spec)
    feats = jnp.asarray(
        np.random.RandomState(2).rand(4, 7, 16), jnp.float32)
    probs = heads.apply_crm(params, feats)
    assert probs.shape == (4, 10)
    p = np.asarray(probs)
    assert np.all(p >= 0) and np.all(p <= 1.0 + 1e-6)


def test_test_embedding_l2_norm():
    feats = jnp.asarray(np.random.RandomState(3).rand(4, 7, 16),
                        jnp.float32)
    emb = heads.test_embedding(feats, normalize=True)
    assert emb.shape == (4, 112)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), np.ones(4), atol=1e-5)


def test_group_norm_head():
    """USE_GN replaces the per-combo BN with GroupNorm
    (reference reid_heads.py:61-74 ConvGN branch)."""
    import jax
    import jax.numpy as jnp
    from pps_tpu.config import cfg, merge_cfg_from_list, assert_and_infer_cfg
    from pps_tpu.models.model import build_model
    merge_cfg_from_list([
        'MODEL.TYPE', 'generalized_reid',
        'MODEL.CONV_BODY', 'ResNet.add_ResNet50_conv5_body',
        'MODEL.NUM_CLASSES', '5', 'MODEL.USE_BN', 'True',
        'MODEL.USE_GN', 'True',
        'FAST_RCNN.ROI_BOX_HEAD', 'pps_heads.add_pps_part_head',
        'GROUP_NORM.NUM_GROUPS', '4',
        'REID.SCALE', '(32, 96)', 'REID.BPM_STRIP_NUM', '3',
        'REID.BPM_DIM', '16', 'REID.NORMALIZE_FEATURE', 'True'])
    assert_and_infer_cfg(make_immutable=False)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    assert 'pps_gn_s' in params and 'pps_bn_s' not in params
    assert not any(k.startswith('pps_bn') for k in state)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 96, 32, 3),
                    jnp.float32)
    emb = model.extract_features(params, state, x)
    assert emb.shape == (2, model.embedding_dim)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(emb, axis=1)), 1.0, rtol=1e-5)
    # train path works and GN gets gradients
    labels = np.array([0, 1], np.int32)
    oh = np.zeros((2, 4), np.float32); oh[np.arange(2), labels] = 1
    batch = {'data': np.asarray(x), 'labels_int32': labels, 'labels_oh': oh}
    g = jax.grad(lambda p: model.train_forward(
        p, state, batch, jax.random.PRNGKey(1), jnp.float32(0.0))[0])(params)
    assert float(jnp.max(jnp.abs(g['pps_gn_s']))) > 0
