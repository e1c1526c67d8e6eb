"""Device-mesh parallelism for pps-tpu.

TPU-native replacement of the reference's graph-replication data
parallelism (/root/reference/detectron/modeling/optimizer.py:33-87) and its
subprocess-sharded inference (/root/reference/detectron/core/test_engine.py:184-229):
a named `jax.sharding.Mesh` + jit sharding annotations, with XLA inserting
the ICI collectives that the reference hand-built as muji/NCCL allreduce ops.
"""

from pps_tpu.parallel.mesh import (build_mesh, batch_sharding,
                                   replicated, param_shardings)
from pps_tpu.parallel.train_step import (make_train_step,
                                         place_train_state, shard_batch)
from pps_tpu.parallel.eval_step import make_extract_fn, extract_features
