from temporalalignnet_tpu.data.htm import (
    HTMFeatureDataset,
    build_vlen_table,
    load_vlen_table,
    stack_samples,
)
from temporalalignnet_tpu.data.clips import HTMClipDataset
from temporalalignnet_tpu.data.htm_align import HTMAlignDataset, HTMAlignTrainDataset
from temporalalignnet_tpu.data.padding import pad_tokens, pad_video_by_last
from temporalalignnet_tpu.data.prefetch import TrainLoader, make_device_put
from temporalalignnet_tpu.data.synthetic import synthetic_batch, synthetic_video_corpus
from temporalalignnet_tpu.data.yc2 import YC2RetrievalDataset, YC2TrainDataset

__all__ = [
    "HTMFeatureDataset",
    "HTMAlignDataset",
    "HTMAlignTrainDataset",
    "HTMClipDataset",
    "YC2RetrievalDataset",
    "YC2TrainDataset",
    "TrainLoader",
    "make_device_put",
    "build_vlen_table",
    "load_vlen_table",
    "stack_samples",
    "pad_tokens",
    "pad_video_by_last",
    "synthetic_batch",
    "synthetic_video_corpus",
]
