"""IVF recall on REAL float embeddings (VERDICT r3 #3).

The previously quoted IVF recall numbers came from an integer-noise
synthetic whose duplicate rows tie distances — BASELINE.md itself notes
ties cap recall for ANY method, so they under-measure the probe.  This
tool measures recall-vs-nprobe on embeddings the actual flagship model
produces:

1. fabricate a synthetic identity set (smooth per-identity base
   textures at REID.SCALE, so identities have distinct low-frequency
   structure the conv body can separate),
2. TRAIN the real flagship (PPS+CRM+triplet, mesh-sharded train step,
   uint8 augment wire) on jittered variants for --train-steps steps —
   real metric structure, not random-feature clustering,
3. embed --per-id augmentation-jittered gallery variants per identity
   through the batched bf16 extraction path (the same features a
   gallery build produces),
4. quantize to the serving int8 layout (`ops/topk.quantize_gallery`),
5. sweep nprobe and record recall@k of the IVF probe against the EXACT
   top-k over the same int8 device gallery (isolates probe loss from
   quantization loss, mirroring the serving fallback contract: exact
   mode is the recall=1 reference).

Reference anchor for the recall semantics: the evaluator's exact
distances (reference detectron/datasets/reid_dataset_evaluator.py:
244-272); the reference itself ships no ANN path.

Prints ONE json line.  Runs on the real TPU chip (several minutes:
gallery H2D through the tunnel dominates).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def make_identities(n_ids, h, w, seed=0):
    """Per-identity smooth base textures: a coarse random grid upsampled
    to (h, w) — distinct low-frequency appearance per identity."""
    import cv2
    rng = np.random.RandomState(seed)
    bases = np.empty((n_ids, h, w, 3), np.uint8)
    for i in range(n_ids):
        coarse = rng.randint(0, 256, (12, 4, 3), np.uint8)
        bases[i] = cv2.resize(coarse, (w, h),
                              interpolation=cv2.INTER_CUBIC)
    return bases


def jitter(base, rng):
    """One augmentation-jittered view: shift, brightness, noise, flip."""
    import cv2
    h, w = base.shape[:2]
    # pad + random-crop (translation up to ~6% of each side)
    py, px = h // 16, w // 16
    padded = cv2.copyMakeBorder(base, py, py, px, px, cv2.BORDER_REFLECT)
    y0 = rng.randint(0, 2 * py + 1)
    x0 = rng.randint(0, 2 * px + 1)
    im = padded[y0:y0 + h, x0:x0 + w]
    if rng.rand() < 0.5:
        im = im[:, ::-1]
    gain = 0.8 + 0.4 * rng.rand()
    noise = rng.randn(h, w, 3) * 8.0
    return np.clip(im.astype(np.float32) * gain + noise,
                   0, 255).astype(np.uint8)


def train_flagship(cfg, model, mesh, bases, steps, seed=1):
    """Train the real mesh-sharded step on P x K jittered identity
    batches; returns trained (params, state) fetched to host."""
    import jax
    import jax.numpy as jnp
    from pps_tpu.parallel import train_step as ts_lib
    from pps_tpu.solver import optimizer as opt_lib

    p, k = cfg.REID.P, cfg.REID.K
    n_ids = bases.shape[0]
    nc = cfg.MODEL.NUM_CLASSES
    params, state = model.init(jax.random.PRNGKey(cfg.RNG_SEED))
    meta = opt_lib.make_param_meta(params, cfg)
    opt_state = opt_lib.init_opt_state(
        params, flavor=opt_lib.flavor_from_cfg(cfg),
        iter_size=cfg.REID.ITER_SIZE)
    step = ts_lib.make_train_step(model, cfg, mesh, meta=meta)
    rng = np.random.RandomState(seed)

    def host_batch():
        ids = rng.choice(n_ids, size=p, replace=False)
        labels = np.repeat(ids, k).astype(np.int32)
        ims = np.stack([jitter(bases[i], rng) for i in labels])
        oh = np.zeros((p * k, nc - 1), np.float32)
        oh[np.arange(p * k), labels] = 1.0
        return {'data_u8': ims,
                'flipped': np.zeros((p * k,), bool),
                'labels_int32': labels, 'labels_oh': oh}

    loss = None
    with mesh:
        ts = ts_lib.place_train_state(
            mesh, {'params': params, 'state': state, 'opt': opt_state})
        for i in range(steps):
            db = ts_lib.shard_batch(mesh, host_batch())
            ts, logs = step(ts, db, jnp.float32(0.01), jnp.float32(1.0),
                            jax.random.PRNGKey(i + 1))
            if i % 25 == 0 or i == steps - 1:
                loss = float(logs['loss'])  # sync point: keeps the host
                print('step %d loss %.4f' % (i, loss), file=sys.stderr,
                      flush=True)
        params = jax.device_get(ts['params'])
        state = jax.device_get(ts['state'])
    return params, state, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n-ids', type=int, default=256)
    ap.add_argument('--per-id', type=int, default=200,
                    help='gallery rows per identity')
    ap.add_argument('--queries', type=int, default=64)
    ap.add_argument('--train-steps', type=int, default=150)
    ap.add_argument('--topk', type=int, default=100)
    ap.add_argument('--embed-batch', type=int, default=256)
    ap.add_argument('--nprobes', default='2,4,8,16,32')
    ap.add_argument('--workdir', default='/root/.pps_ivf_recall',
                    help='cache dir for the trained embeddings: train + '
                         'embed are the expensive stages (tens of '
                         'minutes through the tunnel), so re-runs of '
                         'the sweep load them from here')
    args = ap.parse_args()

    import jax
    from pps_tpu.utils.env import configure_jax_cache
    configure_jax_cache()
    import jax.numpy as jnp
    import __graft_entry__ as g
    from pps_tpu.models.model import build_model
    from pps_tpu.parallel import mesh as mesh_lib
    from pps_tpu.parallel import eval_step as es_lib
    from pps_tpu.ops.topk import quantize_gallery, streaming_topk
    from pps_tpu.ops import ivf as ivf_ops

    cfg = g._flagship_cfg(num_classes=args.n_ids + 1)
    cfg.immutable(False)
    model = build_model(cfg)
    mesh = mesh_lib.build_mesh(cfg)
    w, h = cfg.REID.SCALE

    ng = args.n_ids * args.per_id
    # fingerprint the model/config into the cache key: a sweep must not
    # silently report recall for embeddings of a model that no longer
    # exists (advisor r4).  cfg dump covers architecture knobs; the
    # extraction-path source files cover code changes.
    import hashlib
    fp = hashlib.md5()
    fp.update(repr(sorted(cfg.items(), key=lambda kv: kv[0])).encode())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in ('pps_tpu/models/model.py', 'pps_tpu/models/resnet.py',
                'pps_tpu/models/heads.py', 'pps_tpu/parallel/eval_step.py',
                'pps_tpu/data/device_preprocess.py'):
        with open(os.path.join(root, rel), 'rb') as f:
            fp.update(f.read())
    cache = os.path.join(
        args.workdir, 'embeds_ids%d_per%d_q%d_steps%d_%s.npz'
        % (args.n_ids, args.per_id, args.queries, args.train_steps,
           fp.hexdigest()[:10]))
    if os.path.exists(cache):
        data = np.load(cache)
        gal, qv = data['gal'], data['qv']
        loss = float(data['loss'])
        t_train = t_embed = 0.0
        print('loaded cached embeddings %s (%d x %d)'
              % (cache, gal.shape[0], gal.shape[1]), file=sys.stderr,
              flush=True)
    else:
        bases = make_identities(args.n_ids, h, w, seed=0)
        t0 = time.time()
        params, state, loss = train_flagship(cfg, model, mesh, bases,
                                             args.train_steps)
        t_train = time.time() - t0
        print('trained %d steps in %.1f s (loss %.3f)'
              % (args.train_steps, t_train, loss), file=sys.stderr,
              flush=True)

        # embed gallery + queries through the batched extraction path
        extract = es_lib.make_extract_fn(
            model, mesh, flip_tta=False,
            device_preproc=(np.asarray(cfg.PIXEL_MEANS), (h, w)))
        rng = np.random.RandomState(7)

        def embed_stream(n_rows, owner_of):
            feats, bs = [], args.embed_batch
            for s in range(0, n_rows, bs):
                ims = np.stack([jitter(bases[owner_of(i)], rng)
                                for i in range(s, min(s + bs, n_rows))])
                pad = bs - ims.shape[0]
                if pad:
                    ims = np.concatenate([ims, np.tile(ims[-1:],
                                                       (pad, 1, 1, 1))])
                f = np.asarray(extract(params, state, ims), np.float32)
                feats.append(f[:bs - pad])
                if s % (bs * 16) == 0:
                    print('embedded %d/%d' % (s, n_rows), file=sys.stderr,
                          flush=True)
            return np.concatenate(feats)

        t0 = time.time()
        gal = embed_stream(ng, lambda i: i % args.n_ids)
        qv = embed_stream(args.queries, lambda i: i % args.n_ids)
        t_embed = time.time() - t0
        os.makedirs(args.workdir, exist_ok=True)
        np.savez(cache, gal=gal, qv=qv, loss=np.float32(loss))
        print('cached embeddings to %s' % cache, file=sys.stderr,
              flush=True)

    # serving int8 layout; exact GT over the same representation
    g8, sc = quantize_gallery(gal)
    gd = jax.device_put(np.asarray(g8))
    sd = jax.device_put(np.asarray(sc, np.float32))
    qd = jax.device_put(qv)
    _, ei = streaming_topk(qd, gd, k=args.topk, chunk=65536, g_scale=sd)
    ei = np.asarray(ei)

    nlist = ivf_ops.default_nlist(ng)
    cent = ivf_ops.kmeans(np.asarray(g8), nlist, iters=10, seed=0,
                          g_scale=np.asarray(sc, np.float32))
    nlist = int(np.asarray(cent).shape[0])
    assign = ivf_ops.assign_clusters(gd, cent, g_scale=sd)
    perm, starts = ivf_ops.build_ivf(np.asarray(assign, np.int32), nlist)
    take = jax.jit(lambda a, p: jnp.take(a, p, axis=0))
    perm_dev = jax.device_put(perm)
    gd_s, sd_s = take(gd, perm_dev), take(sd, perm_dev)
    starts_dev = jax.device_put(starts)

    sweep = {}
    for nprobe in [int(x) for x in args.nprobes.split(',')]:
        budget = min(ng, max(2048, 4 * nprobe * ng // max(nlist, 1)))
        _, pos = ivf_ops.ivf_topk(qd, gd_s, cent, starts_dev,
                                  k=args.topk, nprobe=nprobe,
                                  budget=budget, chunk=1024,
                                  g_scale=sd_s)
        pos = np.asarray(pos)
        # unfilled probe slots come back -1 (probed cells held fewer
        # than k candidates): drop them — clipping would count perm[0]
        # as retrieved and inflate the recall this tool exists to
        # measure honestly
        got = np.where(pos >= 0, perm[np.clip(pos, 0, ng - 1)], -1)
        sweep[nprobe] = round(float(np.mean(
            [len(set(got[r][got[r] >= 0].tolist()) & set(ei[r].tolist()))
             / ei.shape[1] for r in range(args.queries)])), 4)

    print(json.dumps({
        'metric': 'ivf_recall_real_embeddings',
        'gallery': ng, 'dim': int(gal.shape[1]), 'n_ids': args.n_ids,
        'train_steps': args.train_steps, 'final_loss': round(loss, 3),
        'nlist': nlist, 'k': args.topk,
        'recall_sweep_nprobe': sweep,
        'train_s': round(t_train, 1), 'embed_s': round(t_embed, 1),
        'device_kind': jax.devices()[0].device_kind,
    }))


if __name__ == '__main__':
    main()
