#!/usr/bin/env python
"""Export the inference model as a deployable artifact.

The TPU-native analog of the reference's train-pkl -> predict_net protobuf
deploy converter (/root/reference/tools/convert_pkl_to_pb.py): the jitted
feature-extraction function is serialized with ``jax.export`` to a
StableHLO artifact that any XLA runtime (TPU serving, IFRT, PJRT plugins)
can load without the Python model code.

  python tools/export_model.py --cfg <yaml> --weights model_final.pkl \
      --out model.stablehlo [--batch 64]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg', dest='cfg_file', required=True)
    parser.add_argument('--weights', default='')
    parser.add_argument('--out', required=True)
    parser.add_argument('--batch', type=int, default=64)
    parser.add_argument('--fold-bn', dest='fold_bn', action='store_true',
                        help='fold backbone BN into conv weights before '
                             'export (models/folding.py)')
    parser.add_argument('--int8', action='store_true',
                        help='export the int8 PTQ serving graph '
                             '(models/quantize.py; implies BN folding). '
                             'Requires --calib-npy or --calib-dataset')
    parser.add_argument('--calib-npy', default='',
                        help='[N,H,W,3] float32 .npy of preprocessed '
                             '(BGR mean-subtracted) calibration images')
    parser.add_argument('--calib-dataset', default='',
                        help='calibrate on the first TPU.INT8_CALIB_IMAGES '
                             'images of this catalog dataset')
    parser.add_argument('opts', nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    from pps_tpu.utils.env import apply_platform_env, configure_jax_cache
    apply_platform_env()
    configure_jax_cache()
    import jax.numpy as jnp
    from jax import export as jax_export

    from pps_tpu.config import (cfg, merge_cfg_from_file,
                                merge_cfg_from_list, assert_and_infer_cfg)
    from pps_tpu.engine import checkpoint as ckpt_lib
    from pps_tpu.models.model import build_model
    from pps_tpu.utils.logging import setup_logging

    logger = setup_logging(__name__)
    merge_cfg_from_file(args.cfg_file)
    if args.opts:
        merge_cfg_from_list(args.opts)
    assert_and_infer_cfg(make_immutable=False)

    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(cfg.RNG_SEED))
    if args.weights:
        params, state, _ = ckpt_lib.load_checkpoint(
            args.weights, model, params, state)
    if args.int8:
        # quantize from the un-folded params (quantize_for_eval folds
        # internally), so --fold-bn is subsumed
        import numpy as np
        from pps_tpu.models.quantize import quantize_for_eval
        if args.calib_npy:
            calib = np.load(args.calib_npy)
        elif args.calib_dataset:
            from pps_tpu.data.json_dataset import roidb_for_test
            from pps_tpu.engine.test import preprocess_images
            roidb = roidb_for_test(args.calib_dataset)
            n = max(1, min(int(cfg.TPU.INT8_CALIB_IMAGES), len(roidb)))
            calib = preprocess_images(roidb[:n], cfg)
        else:
            parser.error('--int8 requires --calib-npy or --calib-dataset '
                         '(static activation scales need real data)')
        params = quantize_for_eval(model, params, state, calib)
        logger.info('int8 PTQ: quantized %d body convs',
                    sum(1 for k in params if k.endswith('_wq')))
    elif args.fold_bn:
        from pps_tpu.models.folding import fold_conv_bn
        params = fold_conv_bn(params, state)

    w, h = cfg.REID.SCALE

    def serve(images):
        """[B, H, W, 3] BGR mean-subtracted -> [B, E] embeddings."""
        return model.extract_features(params, state, images)

    spec = jax.ShapeDtypeStruct((args.batch, h, w, 3), jnp.float32)
    exported = jax_export.export(jax.jit(serve))(spec)
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    logger.info('exported %s: batch=%d embedding=%d, %d bytes '
                '(StableHLO, load with jax.export.deserialize)',
                args.out, args.batch, model.embedding_dim, len(blob))


if __name__ == '__main__':
    main()
