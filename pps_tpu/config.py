"""Global configuration for pps-tpu.

A fresh, TPU-native re-implementation of the reference config system
(/root/reference/detectron/core/config.py).  The key surface is kept
yaml-compatible with the reference so its shipped configs (e.g.
``configs/market1501/pps_crm_triplet_R-50_1x.yaml``) load unchanged:

* global ``cfg`` AttrDict with the same section/key names for the live re-ID
  path (MODEL / SOLVER / TRAIN / TEST / FPN / FAST_RCNN / RESNETS / REID / ...)
* ``merge_cfg_from_file`` (yaml), ``merge_cfg_from_list`` (``KEY VALUE``
  remainder list with type coercion), ``assert_and_infer_cfg`` (freeze)
* deprecated keys from the dormant detection stack are accepted and ignored
  with a warning instead of erroring, so reference yamls always parse.

New, TPU-only keys live under the ``TPU`` section (mesh shape / axis names /
eval batching); the reference has no equivalent because its device placement
is baked into the Caffe2 graph build (reference modeling/optimizer.py:33-87).
"""

import ast
import copy
import logging
import os

import numpy as np
import yaml

from pps_tpu.utils.collections import AttrDict

logger = logging.getLogger(__name__)

__C = AttrDict()
cfg = __C

# ---------------------------------------------------------------------------- #
# Model options
# ---------------------------------------------------------------------------- #
__C.MODEL = AttrDict()
__C.MODEL.TYPE = ''
__C.MODEL.CONV_BODY = ''
__C.MODEL.NUM_CLASSES = -1
__C.MODEL.USE_BN = False
__C.MODEL.USE_GN = False
# Compute dtype for the conv body on TPU ('bfloat16' or 'float32').  Params
# are always kept in float32; bfloat16 activations feed the MXU at 2x rate.
__C.MODEL.DTYPE = 'float32'

__C.NUM_GPUS = 1  # retained name for yaml compat; == number of devices

# ---------------------------------------------------------------------------- #
# Solver options (reference config.py:570-650)
# ---------------------------------------------------------------------------- #
__C.SOLVER = AttrDict()
__C.SOLVER.BASE_LR = 0.001
__C.SOLVER.LR_SCALE_NEW_PARAM = 10.0
__C.SOLVER.LR_SCALE_NEW_FC = 10.0
__C.SOLVER.LR_POLICY = 'step'
__C.SOLVER.GAMMA = 0.1
__C.SOLVER.STEP_SIZE = 30000
__C.SOLVER.STEPS = []
__C.SOLVER.LRS = []
__C.SOLVER.MAX_ITER = 40000
__C.SOLVER.MOMENTUM = 0.9
__C.SOLVER.WEIGHT_DECAY = 0.0005
__C.SOLVER.WEIGHT_DECAY_GN = 0.0
__C.SOLVER.WARM_UP_ITERS = 500
__C.SOLVER.WARM_UP_FACTOR = 1.0 / 3.0
__C.SOLVER.WARM_UP_METHOD = 'linear'
__C.SOLVER.SCALE_MOMENTUM = True
__C.SOLVER.SCALE_MOMENTUM_THRESHOLD = 1.1
__C.SOLVER.LOG_LR_CHANGE_THRESHOLD = 1.1

# ---------------------------------------------------------------------------- #
# Training options
# ---------------------------------------------------------------------------- #
__C.TRAIN = AttrDict()
__C.TRAIN.WEIGHTS = ''
__C.TRAIN.DATASETS = ()
__C.TRAIN.SCALES = (600, )
__C.TRAIN.MAX_SIZE = 1000
__C.TRAIN.IMS_PER_BATCH = 2
__C.TRAIN.BATCH_SIZE_PER_IM = 64
__C.TRAIN.USE_FLIPPED = True
__C.TRAIN.ASPECT_GROUPING = True
__C.TRAIN.SNAPSHOT_ITERS = 20000
__C.TRAIN.FREEZE_AT = 2
__C.TRAIN.AUTO_RESUME = True
__C.TRAIN.FREEZE_CONV_BODY = False

# ---------------------------------------------------------------------------- #
# Inference ('test') options
# ---------------------------------------------------------------------------- #
__C.TEST = AttrDict()
__C.TEST.WEIGHTS = ''
__C.TEST.DATASETS = ()
__C.TEST.SCALE = 600
__C.TEST.MAX_SIZE = 1000
__C.TEST.PRECOMPUTED_PROPOSALS = False
# Batched feature extraction size per device (reference runs 1 image per
# RunNet — test_engine.py:282; batching is the main TPU throughput lever).
__C.TEST.IMS_PER_BATCH = 64

__C.TEST.BBOX_AUG = AttrDict()
__C.TEST.BBOX_AUG.ENABLED = False
__C.TEST.BBOX_AUG.H_FLIP = False

# ---------------------------------------------------------------------------- #
# FPN options (re-ID multi-scale variant; reference FPN_reid.py)
# ---------------------------------------------------------------------------- #
__C.FPN = AttrDict()
__C.FPN.FPN_ON = False
__C.FPN.DIM = 256
__C.FPN.ZERO_INIT_LATERAL = False
__C.FPN.USE_GN = False
__C.FPN.COARSEST_STRIDE = 32
__C.FPN.MULTILEVEL_ROIS = False

# ---------------------------------------------------------------------------- #
# Fast R-CNN options (only ROI_BOX_HEAD is live: selects the re-ID part head)
# ---------------------------------------------------------------------------- #
__C.FAST_RCNN = AttrDict()
__C.FAST_RCNN.ROI_BOX_HEAD = ''
__C.FAST_RCNN.MLP_HEAD_DIM = 1024

# ---------------------------------------------------------------------------- #
# ResNet options
# ---------------------------------------------------------------------------- #
__C.RESNETS = AttrDict()
__C.RESNETS.NUM_GROUPS = 1
__C.RESNETS.WIDTH_PER_GROUP = 64
__C.RESNETS.STRIDE_1X1 = True
__C.RESNETS.TRANS_FUNC = 'bottleneck_transformation'
__C.RESNETS.RES5_DILATION = 1
__C.RESNETS.RES5_STRIDE = 2
__C.RESNETS.SHORTCUT_FUNC = 'basic_bn_shortcut'
__C.RESNETS.STEM_FUNC = 'basic_bn_stem'

# ---------------------------------------------------------------------------- #
# Group normalization
# ---------------------------------------------------------------------------- #
__C.GROUP_NORM = AttrDict()
__C.GROUP_NORM.DIM_PER_GP = -1
__C.GROUP_NORM.NUM_GROUPS = 32
__C.GROUP_NORM.EPSILON = 1e-5

# ---------------------------------------------------------------------------- #
# Re-ID options (the PPS extension; reference config.py:1016-1088)
# ---------------------------------------------------------------------------- #
__C.REID = AttrDict()
__C.REID.SCALE = (128, 384)  # (width, height)
__C.REID.VIS = False
__C.REID.RERANK = True
__C.REID.ITER_SIZE = 1
__C.REID.BPM_DIM = 256
__C.REID.BPM_STRIP_NUM = 6
__C.REID.CRM = False
__C.REID.TRIPLET_LOSS = False
__C.REID.TRIPLET_LOSS_CROSS = False
__C.REID.TRIPLET_LOSS_START = 10
__C.REID.DROPOUT_FEATURE = False
__C.REID.NORMALIZE_FEATURE = False
__C.REID.MAX_AVE_FEATURE = False
__C.REID.P = 16
__C.REID.K = 4
__C.REID.FPN_SHARED = False
__C.REID.FPN_NUM = 4
__C.REID.APM = False
__C.REID.PSE_ON = False
__C.REID.PSE_VIEW = 4
__C.REID.PSE_WEIGHT = 1.0
__C.REID.CROP_PROB = 0.0
__C.REID.CROP_RATIO = 1.0
__C.REID.HORIZONTAL_CROP_PROB = 0.0
__C.REID.HORIZONTAL_CROP_RATIO = 1.0
__C.REID.HSV_JITTER_PROB = 0.0
__C.REID.SATURATION_RANGE = 0.0
__C.REID.HUE_RANGE = 0.0
__C.REID.VALUE_RANGE = 0.0
__C.REID.GAUSSIAN_BLUR_PROB = 0.0
__C.REID.GAUSSIAN_BLUR_KERNEL = 7
__C.REID.RANDOM_ERASING_PROB = 0.0
__C.REID.SL = 0.02
__C.REID.SH = 0.4
__C.REID.R1 = 0.3
__C.REID.SGD_PT = False

# ---------------------------------------------------------------------------- #
# Data loader options
# ---------------------------------------------------------------------------- #
__C.DATA_LOADER = AttrDict()
__C.DATA_LOADER.NUM_THREADS = 4
__C.DATA_LOADER.MINIBATCH_QUEUE_SIZE = 64
__C.DATA_LOADER.BLOBS_QUEUE_CAPACITY = 8

# ---------------------------------------------------------------------------- #
# TPU options (new; no reference equivalent — device placement there is baked
# into the Caffe2 graph build, reference modeling/optimizer.py:33-87)
# ---------------------------------------------------------------------------- #
__C.TPU = AttrDict()
# Data-parallel axis name used in shard_map/pjit.
__C.TPU.DATA_AXIS = 'data'
# Model/tensor-parallel axis name; the stacked per-combo classifier FCs
# ([R, D, C]) shard their class dim C over this axis.
__C.TPU.MODEL_AXIS = 'model'
# Mesh shape as (data, model); -1 in the data slot = all remaining devices.
__C.TPU.MESH_SHAPE = (-1, 1)
# Number of devices for the data mesh; -1 = all visible jax devices.
__C.TPU.NUM_DEVICES = -1
# Donate input buffers in the jitted train step.
__C.TPU.DONATE = True
# Wire dtype for training image batches ('float32' parity default;
# 'bfloat16' halves host->device traffic at ~0.5 pixel-LSB precision cost —
# the conv body computes in bf16 anyway when MODEL.DTYPE is bfloat16).
__C.TPU.WIRE_DTYPE = 'float32'
# Run eval preprocessing (cast / mean-subtract / cv2-exact bicubic resize)
# on device when all test images share one size: uint8 H2D (4x less tunnel
# traffic) + MXU resize (data/device_preprocess.py).
__C.TPU.DEVICE_PREPROC = True
# Run the TRAINING augmentation chain on device (data/device_augment.py):
# the loader ships raw uint8 decodes (~24x less wire traffic at Market
# geometry) and flip/crop/hsv/blur/erasing/resize run fused inside the
# jitted train step with a jax PRNG.  Batches with mixed decode sizes fall
# back to the host chain automatically.  The host path (transforms.py)
# remains the golden reference.
__C.TPU.DEVICE_AUGMENT = True
# Stream test-set extraction in O(prefetch x batch) host memory (decode ->
# preprocess -> H2D -> extract pipelined per batch) instead of decoding the
# whole dataset to one resident stack (engine/test.py:stream_extract).
__C.TPU.STREAMING_EVAL = True
# Run the single-query mAP/CMC computation on device (evaluation/
# device_eval.py: distmat + metrics in one jit, ~913 ms at Market scale vs
# minutes in the numpy per-query loops).  Multi-query and re-ranked
# variants keep the numpy path (golden reference, cross-checked in tests).
__C.TPU.DEVICE_EVAL = True
# Epoch-snapshot checkpoint format: 'pkl' (reference-interop blob pickle,
# written by a background thread) or 'orbax' (native sharded pytree
# directories — each host writes only its own shards, async streaming
# writes; the production multi-host format).  model_final.pkl is always
# written as a pkl for reference interop, and the pkl converter functions
# remain available in either mode (engine/checkpoint.py).
__C.TPU.CKPT_FORMAT = 'pkl'
# int8 post-training quantization for test-set extraction
# (models/quantize.py): fold BN, calibrate static activation scales on the
# first INT8_CALIB_IMAGES test images, and run the conv body as
# s8 x s8 -> s32 on the MXU (~2x bf16 peak).  Embedding head stays f32.
__C.TPU.INT8_EVAL = False
__C.TPU.INT8_CALIB_IMAGES = 256
# Rematerialize the conv body in the backward pass (jax.checkpoint): trades
# ~2x backbone forward FLOPs for not storing its activations — the memonger
# analog (reference utils/train.py:196-207) for large-batch training.
__C.TPU.REMAT = False

# ---------------------------------------------------------------------------- #
# Misc options
# ---------------------------------------------------------------------------- #
__C.OUTPUT_DIR = '.'
# BGR order, matching reference cv2.imread decode + config.py:957.
__C.PIXEL_MEANS = np.array([[[102.9801, 115.9465, 122.7717]]])
__C.RNG_SEED = 3
__C.EPS = 1e-14
__C.EXPECTED_RESULTS = []
__C.EXPECTED_RESULTS_RTOL = 0.1
__C.EXPECTED_RESULTS_ATOL = 0.005
__C.EXPECTED_RESULTS_SIGMA_TOL = 4
# notify this address when an EXPECTED_RESULTS check fails (reference
# core/config.py:996 + task_evaluation.py:246-270); empty = disabled
__C.EXPECTED_RESULTS_EMAIL = ''
__C.USE_NCCL = False  # accepted for yaml compat; collectives are XLA's job
__C.DOWNLOAD_CACHE = '/tmp/pps-tpu-download-cache'
__C.VIS = False

# Dormant-but-ACCEPTED keys: these EXIST above (part of the reference's
# yaml surface for the inherited detection stack) and parse fine, but
# nothing on the live re-ID path reads them — exactly as in the
# reference, where the live path ignores them too.  Anything else that
# is accepted must either be read somewhere or rejected in
# assert_and_infer_cfg.
_DORMANT_ACCEPTED = (
    'TRAIN.SCALES', 'TRAIN.MAX_SIZE', 'TRAIN.BATCH_SIZE_PER_IM',
    'TRAIN.ASPECT_GROUPING', 'TEST.SCALE', 'TEST.MAX_SIZE',
    'TEST.PRECOMPUTED_PROPOSALS', 'FPN.COARSEST_STRIDE',
    'FPN.MULTILEVEL_ROIS', 'FAST_RCNN.MLP_HEAD_DIM', 'USE_NCCL', 'VIS',
    'REID.PSE_VIEW', 'REID.PSE_WEIGHT',
)

# Keys from the dormant Detectron surface that reference yamls may still set.
# They are accepted and ignored (warning) so configs parse unchanged.
_IGNORED_SUBTREES = {
    'MRCNN', 'KRCNN', 'RPN', 'RETINANET', 'RFCN', 'RNG', 'CLUSTER', 'MEMONGER',
}
_IGNORED_KEYS = {
    'MODEL.MASK_ON', 'MODEL.KEYPOINTS_ON', 'MODEL.RPN_ONLY',
    'MODEL.FASTER_RCNN', 'MODEL.CLS_AGNOSTIC_BBOX_REG',
    'MODEL.EXECUTION_TYPE', 'TRAIN.PROPOSAL_FILES', 'TEST.PROPOSAL_FILES',
    'TEST.NMS', 'TEST.RPN_PRE_NMS_TOP_N', 'TEST.RPN_POST_NMS_TOP_N',
    'TEST.DETECTIONS_PER_IM', 'TEST.SCORE_THRESH', 'TEST.COMPETITION_MODE',
    'TEST.FORCE_JSON_DATASET_EVAL', 'TRAIN.RPN_PRE_NMS_TOP_N',
    'TRAIN.RPN_POST_NMS_TOP_N', 'MEMONGER', 'MEMONGER_SHARE_ACTIVATIONS',
    'TEST.PRECOMPUTED_PROPOSALS',
}

_RENAMED_KEYS = {
    'EXAMPLE.RENAMED.KEY': 'EXAMPLE.KEY',  # placeholder used by tests
}


def assert_and_infer_cfg(make_immutable=True):
    """Validate derived config flags and optionally freeze the config.

    Mirrors the reference's contract (reference config.py:1165-1180):
    validation + URL weight caching + freeze.  Keys whose non-default
    values would be silently ignored are hard-rejected here instead, so
    nothing is accepted-but-dead except the documented
    ``_DORMANT_ACCEPTED`` set.
    """
    if __C.MODEL.TYPE == 'generalized_reid':
        assert __C.MODEL.NUM_CLASSES > 1, 'REID needs NUM_CLASSES > 1'
    if __C.REID.TRIPLET_LOSS:
        assert __C.REID.P * __C.REID.K == __C.TRAIN.IMS_PER_BATCH, (
            'P*K ({}*{}) must equal TRAIN.IMS_PER_BATCH ({})'.format(
                __C.REID.P, __C.REID.K, __C.TRAIN.IMS_PER_BATCH))
    # dead reference paths are rejected loudly: in the reference these
    # heads call functions that do not exist (apm_heads.py:194,
    # bpm_pse_heads.py:232), so no working config can set them
    assert not __C.REID.APM and not __C.REID.PSE_ON, (
        'REID.APM / REID.PSE_ON select head variants that are dead in '
        'the reference (they call missing functions) and are not '
        'implemented here')
    # the only body variants built are the ones every PPS config uses;
    # a different TRANS/SHORTCUT/STEM function must fail, not silently
    # build the default
    assert __C.RESNETS.TRANS_FUNC == 'bottleneck_transformation', (
        __C.RESNETS.TRANS_FUNC)
    assert __C.RESNETS.SHORTCUT_FUNC == 'basic_bn_shortcut', (
        __C.RESNETS.SHORTCUT_FUNC)
    assert __C.RESNETS.STEM_FUNC in ('basic_bn_stem', 'basic_gn_stem'), (
        __C.RESNETS.STEM_FUNC)
    # URL weights are downloaded once into DOWNLOAD_CACHE and the key
    # rewritten to the local path (reference config.py:1176-1180)
    from pps_tpu.utils.io import cache_url
    for section in ('TRAIN', 'TEST'):
        w = __C[section].WEIGHTS
        if w:
            __C[section].WEIGHTS = cache_url(w, __C.DOWNLOAD_CACHE)
    if make_immutable:
        cfg.immutable(True)


def get_output_dir(datasets, training=True):
    """<output-dir>/<train|test>/<dataset-name>/ (reference config.py:1197)."""
    dataset_name = ':'.join(datasets) if isinstance(
        datasets, (tuple, list)) else str(datasets)
    tag = 'train' if training else 'test'
    outdir = os.path.join(__C.OUTPUT_DIR, tag, dataset_name)
    if not os.path.exists(outdir):
        os.makedirs(outdir)
    return outdir


def load_cfg(cfg_to_load):
    """Load a yaml config string or file object."""
    if hasattr(cfg_to_load, 'read'):
        cfg_to_load = cfg_to_load.read()
    return yaml.safe_load(cfg_to_load)


def merge_cfg_from_file(cfg_filename):
    """Load a yaml config file and merge it into the global config."""
    with open(cfg_filename, 'r') as f:
        yaml_cfg = AttrDict(_to_attr_dict(yaml.safe_load(f)))
    _merge_a_into_b(yaml_cfg, __C)


def merge_cfg_from_cfg(cfg_other):
    """Merge ``cfg_other`` into the global config."""
    _merge_a_into_b(cfg_other, __C)


def merge_cfg_from_list(cfg_list):
    """Apply ``KEY VALUE`` pairs from the CLI remainder to the global
    config, e.g. ``['SOLVER.BASE_LR', '0.02', 'REID.CRM', 'True']``.

    Same key vetting and value fitting as the yaml path: deprecated
    keys are skipped, renamed keys error with the new name, and the
    value must fit the slot's existing type (see ``_fit_slot``).
    """
    assert len(cfg_list) % 2 == 0, (
        'override list must be KEY VALUE pairs, got an odd-length list')
    for full_key, raw in zip(cfg_list[0::2], cfg_list[1::2]):
        if _key_is_deprecated(full_key):
            continue
        if _key_is_renamed(full_key):
            _raise_key_rename_error(full_key)
        node = __C
        parts = full_key.split('.')
        for part in parts[:-1]:
            assert part in node, 'Non-existent key: {}'.format(full_key)
            node = node[part]
        leaf = parts[-1]
        assert leaf in node, 'Non-existent key: {}'.format(full_key)
        node[leaf] = _fit_slot(_parse_value(raw), node[leaf], full_key)


def reset_cfg():
    """Reset config values to the defaults (for tests)."""
    global _DEFAULT_CFG
    cfg.immutable(False)
    for k in list(cfg.keys()):
        del cfg[k]
    for k, v in copy.deepcopy(_DEFAULT_CFG).items():
        cfg[k] = v


def _to_attr_dict(d):
    if isinstance(d, dict):
        return AttrDict({k: _to_attr_dict(v) for k, v in d.items()})
    return d


def _merge_a_into_b(a, b):
    """Overlay the override tree ``a`` onto the config tree ``b``.

    Every leaf in the overlay must name a slot that already exists in
    ``b`` — a yaml with a typo'd or made-up key is a hard error, never a
    silent no-op.  The exceptions, checked per dotted key: deprecated
    keys are dropped, renamed keys abort with the new spelling, and
    keys belonging to the dormant detection stack (``_IGNORED_KEYS`` /
    ``_IGNORED_SUBTREES``) log a warning and are dropped.

    Iterative worklist rather than recursion: a sub-dict in the overlay
    whose slot holds an AttrDict queues a deeper merge; any other value
    is fitted to the slot's existing type and written.
    """
    pending = [('', a, b)]
    while pending:
        prefix, overlay, target = pending.pop()
        for key, raw in overlay.items():
            full_key = prefix + key
            if key not in target:
                if _key_is_deprecated(full_key):
                    continue
                if _key_is_renamed(full_key):
                    _raise_key_rename_error(full_key)
                if _key_is_ignored(full_key):
                    logger.warning(
                        'Ignoring dormant-detection config key: %s', full_key)
                    continue
                raise KeyError(
                    'Non-existent config key: {}'.format(full_key))
            val = _parse_value(copy.deepcopy(raw))
            if isinstance(target[key], AttrDict) and isinstance(val, dict):
                pending.append((full_key + '.', val, target[key]))
            else:
                target[key] = _fit_slot(val, target[key], full_key)


def _key_is_deprecated(full_key):
    return False


def _key_is_ignored(full_key):
    if full_key in _IGNORED_KEYS:
        return True
    return full_key.split('.')[0] in _IGNORED_SUBTREES


def _key_is_renamed(full_key):
    return full_key in _RENAMED_KEYS


def _raise_key_rename_error(full_key):
    new_key = _RENAMED_KEYS[full_key]
    raise KeyError(
        'Key {} was renamed to {}; please update your config.'.format(
            full_key, new_key))


def _parse_value(raw):
    """Interpret a raw override value.

    CLI overrides (and some yaml scalars) arrive as strings; anything
    that reads as a Python literal — ``'0.5'``, ``'(128, 384)'``,
    ``'True'`` — becomes that literal, and anything that does not (a
    dataset name, a dotted function path) stays a string.  Non-string
    values pass through untouched.
    """
    if not isinstance(raw, str):
        return raw
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


# Permitted cross-type writes into a config slot, tried in order:
# (slot predicate, value predicate, converter).  The slot's current
# value defines its type; yaml/CLI values may legitimately differ in a
# few known ways — list literals for ndarray slots like PIXEL_MEANS,
# unquoted scalars for str slots, int for float, and tuple<->list
# (yaml has no tuple syntax, defaults use tuples for fixed-arity keys).
_SLOT_CONVERSIONS = (
    (lambda old: isinstance(old, np.ndarray),
     lambda new: True,
     lambda new, old: np.array(new, dtype=old.dtype)),
    (lambda old: isinstance(old, str),
     lambda new: True,
     lambda new, old: str(new)),
    (lambda old: isinstance(old, float),
     lambda new: isinstance(new, int),
     lambda new, old: float(new)),
    (lambda old: isinstance(old, list),
     lambda new: isinstance(new, tuple),
     lambda new, old: list(new)),
    (lambda old: isinstance(old, tuple),
     lambda new: isinstance(new, list),
     lambda new, old: tuple(new)),
)


def _fit_slot(new, old, full_key):
    """Fit ``new`` into a config slot whose current value is ``old``.

    Exact type match passes through; otherwise the first applicable
    entry of ``_SLOT_CONVERSIONS`` converts; otherwise the write is a
    config error.
    """
    if type(new) is type(old):
        return new
    for slot_pred, val_pred, convert in _SLOT_CONVERSIONS:
        if slot_pred(old) and val_pred(new):
            return convert(new, old)
    raise ValueError(
        'Type mismatch ({} vs. {}) with values ({} vs. {}) for config '
        'key: {}'.format(type(old), type(new), old, new, full_key))


_DEFAULT_CFG = copy.deepcopy(dict(__C))
