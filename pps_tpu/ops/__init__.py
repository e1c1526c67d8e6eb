from pps_tpu.ops.distance import pairwise_sq_dist, euclidean_distmat
from pps_tpu.ops.batch_hard import batch_hard
from pps_tpu.ops.cross_entropy import cross_entropy_with_logits
