"""The end-to-end accuracy-parity chain as an in-suite assertion.

Composes the per-stage parity proofs into one claim (the strongest
available without the real datasets): synthetic identity data on disk ->
the REAL training driver on the flagship config geometry -> extraction
through BOTH our jit'd mesh-sharded pipeline and the torch
reference-mirror (evaluation/torch_mirror.py) -> BOTH feature sets scored
through the reference evaluator's own AST-exec'd `evaluate` flow
(reference reid_dataset_evaluator.py:29-209) -> every mAP/CMC metric
asserted within the EXPECTED_RESULTS tolerance (reference
task_evaluation.py:200-245).

One-command form: `python tools/e2e_parity.py` (flagship geometry).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tools'))

import e2e_parity  # noqa: E402


@pytest.mark.slow
def test_e2e_accuracy_parity_flagship_geometry(tmp_path):
    root = str(tmp_path)
    cfg = e2e_parity.parity_cfg(root, flagship=True, max_epochs=2)
    # flagship geometry intact after the synthetic-scale shrink
    assert cfg.REID.SCALE == (128, 384)
    assert cfg.REID.BPM_STRIP_NUM == 5
    assert cfg.REID.BPM_DIM == 128

    res_ours, res_torch, f_ours, f_torch, roidb = e2e_parity.run_chain(
        cfg, os.path.join(root, 'out'))

    # the two extraction stacks agree at the feature level
    assert f_ours.shape == f_torch.shape == (len(roidb), 31 * 128)
    cos = np.sum(f_ours * f_torch, axis=1)
    assert cos.min() > 0.9999

    # the test split is non-trivial: rank order is actually exercised
    assert res_torch['single']['mAP'] < 0.999

    failures = e2e_parity.compare(cfg, res_ours, res_torch)
    assert not failures, failures
