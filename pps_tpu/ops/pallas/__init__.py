"""Pallas TPU kernels for the retrieval hot path.

These replace the reference's native CUDA layer
(/root/reference/detectron/ops/*.cu) where a hand kernel actually beats
XLA; everything else (batch-hard, CE-with-logits, SGD rules, the eval
distmat) lowers to fused XLA in pps_tpu/ops/*.py.

A hand-written tiled distmat kernel was built and retired in round 2:
measured head-to-head at Market eval scale on v5e, XLA's expand-form
(ops/distance.py) reaches 134.7 TFLOP/s (one bf16 MXU pass + fused
rank-1/sqrt epilogue) vs 88.3 for the best Pallas tiling — a matmul with
an elementwise epilogue is exactly the program XLA's emitter is tuned
for, so the kernel bought nothing (BASELINE.md round-2 shootout).
Pallas stays for what XLA cannot fuse: the streaming top-k's
chunked-carry selection and the ZeroEven golden-test op.
"""

from pps_tpu.ops.pallas.topk import streaming_topk
from pps_tpu.ops.pallas.zero_even import zero_even
