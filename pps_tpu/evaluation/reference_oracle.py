"""Execute the reference evaluator's own numpy functions as an oracle.

The reference evaluator (/root/reference/detectron/datasets/
reid_dataset_evaluator.py) is pure numpy/sklearn for the metric functions,
but its module imports pycocotools + detectron config, so the oracle
functions (`compute_dist`, `cmc`, `mean_ap`, `re_ranking`, ...) are
extracted from the source via AST and exec'd into a minimal namespace.
Used by tests/test_reference_oracle.py and tools/parity_check.py to turn
"we believe the numerics match" into "checked against the reference's own
code".

`pinned_ap=True` swaps the namespace's `average_precision_score` for our
pinned sklearn-0.18.1 reimplementation: the reference prints a warning on
any sklearn != 0.18.1 (reid_dataset_evaluator.py:393-407), so reference
flow + pinned AP is the actual published metric definition; with the
installed (much newer, step-interpolated) sklearn the oracle instead
characterizes the known step-vs-trapezoid delta.
"""

import ast
import os
from collections import defaultdict

import numpy as np

REFERENCE_EVALUATOR = os.environ.get(
    'PPS_TPU_REFERENCE_EVALUATOR',
    '/root/reference/detectron/datasets/reid_dataset_evaluator.py')

ORACLE_FNS = ('compute_dist', '_unique_sample', 'cmc', 'mean_ap',
              're_ranking', 'parse_im_name')


def available(path=None):
    return os.path.exists(path or REFERENCE_EVALUATOR)


def load_oracle(path=None, pinned_ap=False):
    """Exec the reference's pure-numpy oracle functions from source.

    Returns a dict namespace with ORACLE_FNS.  Raises FileNotFoundError
    when the reference tree is absent (callers gate on available()).
    """
    path = path or REFERENCE_EVALUATOR
    with open(path) as f:
        tree = ast.parse(f.read())
    wanted = [n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in ORACLE_FNS]
    assert len(wanted) == len(ORACLE_FNS), (
        'reference source drifted: found %d of %d oracle functions'
        % (len(wanted), len(ORACLE_FNS)))
    if pinned_ap:
        from pps_tpu.evaluation.metrics import average_precision_v0_18

        def average_precision_score(y_true, y_score):
            return average_precision_v0_18(y_true, y_score)
    else:
        from sklearn.metrics import average_precision_score
    from sklearn.preprocessing import normalize
    ns = dict(np=np, defaultdict=defaultdict,
              average_precision_score=average_precision_score,
              normalize=normalize, print=lambda *a, **k: None)
    code = compile(ast.Module(body=wanted, type_ignores=[]), path, 'exec')
    exec(code, ns)
    return ns


def evaluate_with_oracle(oracle, feat, ids, cams, marks, to_re_rank=True,
                         pool_type='average'):
    """The reference's WHOLE `evaluate` flow (reid_dataset_evaluator.py:
    29-209) composed purely from the exec'd oracle functions: mark
    splitting, Market CMC protocol, multi-query pooling, k-reciprocal
    re-rank blending.  Returns the same results-dict shape as
    pps_tpu.evaluation.evaluator.evaluate.
    """
    feat = np.asarray(feat)
    ids = np.asarray(ids)
    cams = np.asarray(cams)
    marks = np.asarray(marks)
    q_inds = marks == 0
    g_inds = marks == 1
    mq_inds = marks == 2

    cmc_kwargs = dict(separate_camera_set=False, single_gallery_shot=False,
                      first_match_break=True, topk=10)

    def score(dist_mat, q_ids, q_cams):
        m_ap = oracle['mean_ap'](dist_mat, q_ids, ids[g_inds], q_cams,
                                 cams[g_inds])
        cmc_scores = oracle['cmc'](dist_mat, q_ids, ids[g_inds], q_cams,
                                   cams[g_inds], **cmc_kwargs)
        return {'mAP': float(m_ap), 'cmc1': float(cmc_scores[0]),
                'cmc5': float(cmc_scores[4]), 'cmc10': float(cmc_scores[9]),
                'cmc': np.asarray(cmc_scores)}

    results = {}
    q_g = oracle['compute_dist'](feat[q_inds], feat[g_inds], 'euclidean')
    results['single'] = score(q_g, ids[q_inds], cams[q_inds])

    mq_feat = mq_keys = mq_g = None
    if np.any(mq_inds):
        grouped = defaultdict(list)
        for ind, (pid, cam) in enumerate(zip(ids[mq_inds], cams[mq_inds])):
            grouped[(pid, cam)].append(ind)
        mq_keys = list(grouped.keys())
        pool = np.mean if pool_type == 'average' else np.max
        mq_feat = np.stack([
            pool(feat[mq_inds][grouped[k]], axis=0) for k in mq_keys])
        mq_g = oracle['compute_dist'](mq_feat, feat[g_inds], 'euclidean')
        results['multi'] = score(mq_g, np.array([k[0] for k in mq_keys]),
                                 np.array([k[1] for k in mq_keys]))

    if to_re_rank:
        q_q = oracle['compute_dist'](feat[q_inds], feat[q_inds],
                                     'euclidean')
        g_g = oracle['compute_dist'](feat[g_inds], feat[g_inds],
                                     'euclidean')
        rr = oracle['re_ranking'](q_g, q_q, g_g)
        results['single_rerank'] = score(rr, ids[q_inds], cams[q_inds])
        if mq_feat is not None:
            mq_mq = oracle['compute_dist'](mq_feat, mq_feat, 'euclidean')
            rr_mq = oracle['re_ranking'](mq_g, mq_mq, g_g)
            results['multi_rerank'] = score(
                rr_mq, np.array([k[0] for k in mq_keys]),
                np.array([k[1] for k in mq_keys]))
    return results
