"""Pallas TPU kernels.

These replace the reference's native CUDA layer
(/root/reference/detectron/ops/*.cu) where a hand kernel actually beats
XLA; everything else (batch-hard, CE-with-logits, SGD rules, the eval
distmat, the streaming top-k) lowers to fused XLA in pps_tpu/ops/*.py.

Hand-kernel candidates are settled head-to-head on v5e (BASELINE.md):

* tiled distmat — built and RETIRED in round 2: XLA's expand-form
  (ops/distance.py) reaches 134.7 TFLOP/s (one bf16 MXU pass + fused
  rank-1/sqrt epilogue) vs 88.3 for the best Pallas tiling; a matmul
  with an elementwise epilogue is exactly the program XLA's emitter is
  tuned for.
* streaming top-k — NOT Pallas (Mosaic has no sort/top_k lowering): it
  is plain XLA and lives at `pps_tpu/ops/topk.py` (chunked MXU matmuls
  + lax.top_k merges).  It was historically housed in this package and
  is re-exported below for compatibility.

What remains as an actual kernel here: `zero_even` (the golden-test
smoke op proving the Pallas toolchain end-to-end).
"""

from pps_tpu.ops.pallas.zero_even import zero_even

# compatibility re-export: streaming_topk predates the pallas/xla
# relabeling (it is plain XLA and now lives in pps_tpu/ops/topk.py)
from pps_tpu.ops.topk import streaming_topk
