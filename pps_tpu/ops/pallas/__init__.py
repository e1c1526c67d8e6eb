"""Pallas TPU kernels for the retrieval hot path.

These replace the reference's native CUDA layer
(/root/reference/detectron/ops/*.cu) where a hand kernel actually beats
XLA; everything else (batch-hard, CE-with-logits, SGD rules) lowers to
fused XLA in pps_tpu/ops/*.py.
"""

from pps_tpu.ops.pallas.distmat import pallas_euclidean_distmat
from pps_tpu.ops.pallas.topk import streaming_topk
from pps_tpu.ops.pallas.zero_even import zero_even
