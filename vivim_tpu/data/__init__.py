"""Host-side data layer: gathering, k-fold splitting, clip windowing,
augmentation, and a prefetching loader feeding the TPU."""

from vivim_tpu.data.clips import (
    sliding_clip_windows,
    select_equispaced,
    select_random,
)
from vivim_tpu.data.dataset import ClipDataset, ClipRecord, index_video_tree
from vivim_tpu.data.gather import (
    gather_binary_frames,
    gather_frame_sequences,
    gather_multiclass_frames,
)
from vivim_tpu.data.loader import DataLoader

__all__ = [
    "ClipDataset",
    "ClipRecord",
    "DataLoader",
    "gather_binary_frames",
    "gather_frame_sequences",
    "gather_multiclass_frames",
    "index_video_tree",
    "select_equispaced",
    "select_random",
    "sliding_clip_windows",
]
