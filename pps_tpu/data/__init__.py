"""Data layer: datasets, augmentation, P x K sampling, prefetching loader.

TPU-native counterpart of the reference's L4 data layer
(/root/reference/detectron/datasets + /root/reference/detectron/roi_data):
the threaded-BlobsQueue machinery becomes a host-side prefetch loader that
yields mesh-sharded device batches.
"""

from pps_tpu.data.catalog import get_im_dir, get_ann_fn, register_dataset
from pps_tpu.data.json_dataset import (ReIDDataset,
                                       combined_roidb_for_training,
                                       roidb_for_test)
from pps_tpu.data.loader import ReIDLoader
from pps_tpu.data.minibatch import get_minibatch
