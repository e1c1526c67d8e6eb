"""Model builder: assembles backbone + part head + losses from cfg.

TPU-native counterpart of the reference's
``model_builder.create('generalized_reid', ...)`` path
(/root/reference/detectron/modeling/model_builder.py:93-108, 242-316).
Instead of mutating a Caffe2 NetDef, ``build_model`` returns a ``ReIDModel``
bundle of pure functions over flat param/state pytrees, ready to be jitted
or shard_mapped by the caller.
"""

import jax
import jax.numpy as jnp

from pps_tpu.models import fpn as fpn_lib
from pps_tpu.models import heads as head_lib
from pps_tpu.models import losses as loss_lib
from pps_tpu.models import resnet as resnet_lib


def _depth_from_name(name):
    for d in (152, 101, 50):
        if str(d) in name:
            return d
    return 50


class ReIDModel:
    """Static model description + pure apply functions.

    Attributes:
      resnet_spec / head_spec: static dicts derived from cfg.
      init(rng) -> (params, state)
      extract_features(params, state, images) -> [B, R*D] embeddings (test)
      train_forward(params, state, batch, rng, loss_scale_factor)
          -> (total_loss, aux) for jax.grad
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.depth = _depth_from_name(cfg.MODEL.CONV_BODY)
        self.resnet_spec = resnet_lib.resnet_spec(cfg, self.depth)
        self.fpn_spec = None
        if cfg.FPN.FPN_ON:
            # "scale-free" multi-scale variant (reference FPN_reid.py).
            # Head params are shared across pyramid levels: the reference's
            # per-level head names collapse to the same blob name via
            # get_prefix (pps_heads.py:28-35), so even its "non-shared" mode
            # shares weights; FPN_SHARED additionally batch-concats the
            # levels so one loss set covers all (pps_heads.py:119-142).
            self.fpn_spec = fpn_lib.fpn_spec(cfg, self.depth)
            assert cfg.REID.FPN_SHARED, (
                'FPN_ON requires REID.FPN_SHARED: the reference non-shared '
                'mode is broken by head-name collisions (pps_heads.py:28)')
        self.head_spec = head_lib.head_spec(
            cfg, self.resnet_spec['spatial_scale'])
        if self.fpn_spec is not None:
            # per-level strip splits: scales (1/16, 1/16, 1/8, 1/4)
            self.level_splits = [
                head_lib.strip_splits(cfg.REID.BPM_STRIP_NUM,
                                      cfg.REID.SCALE[1], sc)
                for sc in self.fpn_spec['spatial_scales']]
            self.head_spec['splits'] = self.level_splits[0]
        self.masks = head_lib.combo_masks(self.head_spec)
        # stacked-param prefix: the head kind, so the reference's
        # string-matched LR groups (optimizer.py:133-151: 'pps'/'bpm'/...
        # => new-param LR; + 'fc' => new-fc LR) classify our stacked names
        # identically to the per-combo originals.
        self.head_param_prefix = self.head_spec['kind']
        self.num_combos = len(self.head_spec['combos'])
        self.embedding_dim = self.num_combos * self.head_spec['bpm_dim']
        self.use_triplet = cfg.REID.TRIPLET_LOSS
        self.use_crm = cfg.REID.CRM
        self.normalize_feature = cfg.REID.NORMALIZE_FEATURE
        # stop-gradient on the body output (reference
        # model_builder.py:255-257); the optimizer-side bit-freeze is
        # solver/optimizer.trainable_from_cfg
        self.freeze_conv_body = bool(cfg.TRAIN.FREEZE_CONV_BODY)

    # -- init ---------------------------------------------------------------
    def init(self, rng):
        r_backbone, r_head, r_crm, r_fpn = jax.random.split(rng, 4)
        params, state = resnet_lib.init_resnet_params(
            r_backbone, self.resnet_spec)
        head_dim_in = self.resnet_spec['dim_out']
        if self.fpn_spec is not None:
            fp, fs = fpn_lib.init_fpn_params(r_fpn, self.fpn_spec)
            params.update(fp)
            state.update(fs)
            head_dim_in = self.fpn_spec['fpn_dim']
        hp, hs = head_lib.init_head_params(
            r_head, self.head_spec, head_dim_in,
            param_prefix=self.head_param_prefix)
        params.update(hp)
        state.update(hs)
        if self.use_crm:
            params.update(head_lib.init_crm_params(r_crm, self.head_spec))
        return params, state

    # -- shared trunk -------------------------------------------------------
    def _combo_feats(self, feat, splits):
        ave, mx = head_lib.strip_pools(feat.astype(jnp.float32), splits)
        return head_lib.combine_strips(ave, mx, self.masks,
                                       self.head_spec['mode'])

    def _features(self, params, state, images, train, dropout_rng=None):
        """Returns (features [B', R, D], logits [B', R, K], updates) where
        B' = B, or B * FPN_NUM under shared FPN training (level-major batch
        concat, reference pps_heads.py:119-142)."""
        # accept reduced-precision wire formats (TPU.WIRE_DTYPE): params
        # and BN math stay f32; the conv body re-casts per MODEL.DTYPE
        images = images.astype(jnp.float32)
        remat = train and self.cfg.TPU.REMAT
        if self.fpn_spec is None:
            body = lambda p, s, im: resnet_lib.apply_resnet(
                p, s, im, self.resnet_spec, train=train)
            if remat:
                body = jax.checkpoint(body)
            feat, updates = body(params, state, images)
            if train and self.freeze_conv_body:
                feat = jax.lax.stop_gradient(feat)
            combo_feats = self._combo_feats(feat, self.head_spec['splits'])
        else:
            body = lambda p, s, im: resnet_lib.apply_resnet(
                p, s, im, self.resnet_spec, train=train,
                return_stages=True)
            if remat:
                body = jax.checkpoint(body)
            _, stages, updates = body(params, state, images)
            pyramid, fpn_upd = fpn_lib.apply_fpn(
                params, state, stages, self.fpn_spec, train=train)
            updates.update(fpn_upd)
            if train and self.freeze_conv_body:
                # with FPN_ON the pyramid IS the conv-body output
                # (reference add_conv_body_func returns the FPN blobs)
                pyramid = [jax.lax.stop_gradient(p) for p in pyramid]
            if not train:
                # test: coarsest level only (reference pps_heads.py:88-96)
                combo_feats = self._combo_feats(pyramid[0],
                                                self.level_splits[0])
            else:
                combo_feats = jnp.concatenate(
                    [self._combo_feats(p, sp)
                     for p, sp in zip(pyramid, self.level_splits)], axis=0)
        features, logits, upd = head_lib.apply_head(
            params, state, combo_feats, self.head_spec, train=train,
            dropout_rng=dropout_rng, param_prefix=self.head_param_prefix)
        updates.update(upd)
        return features, logits, updates

    # -- test path ----------------------------------------------------------
    def extract_features(self, params, state, images):
        """Test-time embedding (reference reid_heads.py:95-127 concat+norm).

        images: [B, H, W, 3] preprocessed NHWC (BGR, mean-subtracted).
        Returns L2-normalized [B, R*D] embeddings.
        """
        features, _, _ = self._features(params, state, images, train=False)
        return head_lib.test_embedding(features, self.normalize_feature)

    # -- train path ---------------------------------------------------------
    def train_forward(self, params, state, batch, rng, loss_scale_factor):
        """Returns (total_loss, (state_updates, log_dict)).

        batch: {'data': [B,H,W,3], 'labels_int32': [B], 'labels_oh': [B,K]}
        loss_scale_factor: traced scalar; multiplies the triplet term when
        REID.TRIPLET_LOSS_CROSS (reference triplet_loss.py:160-171).
        """
        features, logits, updates = self._features(
            params, state, batch['data'], train=True, dropout_rng=rng)
        labels = batch['labels_int32']
        labels_oh = batch['labels_oh']
        if self.fpn_spec is not None:
            # shared FPN: level-major batch concat => tile labels FPN_NUM
            # times (reference reid_heads.py:145-149, crm_heads.py:110-116)
            n = self.fpn_spec['fpn_num']
            labels = jnp.tile(labels, (n,))
            labels_oh = jnp.tile(labels_oh, (n, 1))

        ce, acc = loss_lib.softmax_ce_losses(logits, labels)
        total = jnp.sum(ce)
        logs = {'accuracy_cls': jnp.mean(acc)}
        # per-combo logs in reference blob naming ({prefix}_loss/_accuracy)
        for r, (prefix, _) in enumerate(self.head_spec['combos']):
            logs[prefix + '_loss'] = ce[r]
            logs[prefix + '_accuracy'] = acc[r]

        if self.use_crm:
            probs = head_lib.apply_crm(params, features)
            crm, crm_acc = loss_lib.crm_loss(probs, labels_oh, labels)
            total = total + crm
            logs['crm_loss'] = crm
            logs['crm_accuracy'] = crm_acc

        if self.use_triplet:
            mrc, ap_mean, an_mean = loss_lib.triplet_losses(
                features, labels, normalize=self.normalize_feature)
            if self.cfg.REID.TRIPLET_LOSS_CROSS:
                tri = mrc * loss_scale_factor
            else:
                tri = mrc
            total = total + loss_lib.TRIPLET_WEIGHT * jnp.sum(tri)
            for r, (prefix, _) in enumerate(self.head_spec['combos']):
                logs[prefix + '_triplet_loss'] = tri[r]
                logs[prefix + '_dist_ap_mean'] = ap_mean[r]
                logs[prefix + '_dist_an_mean'] = an_mean[r]

        logs['loss'] = total
        return total, (updates, logs)


def build_model(cfg):
    assert cfg.MODEL.TYPE == 'generalized_reid', (
        'only the live re-ID path is supported; got MODEL.TYPE={}'.format(
            cfg.MODEL.TYPE))
    return ReIDModel(cfg)
