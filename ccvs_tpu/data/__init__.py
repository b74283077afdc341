"""Input pipeline: datasets, clip indexing, augmentation, prefetching loader.

Replaces the reference's torchvision-based data layer (`data/`) with a
NumPy/PIL pipeline producing fixed-shape NHWC batches for jit. Host-side
(per-sample CPU) work stays on host threads; everything batched is
jit-compatible.
"""

from ccvs_tpu.data.base import BaseVideoDataset, create_dataset, group_collate
from ccvs_tpu.data.loader import FoldCycler, PrefetchLoader

__all__ = ["BaseVideoDataset", "create_dataset", "group_collate", "PrefetchLoader", "FoldCycler"]
