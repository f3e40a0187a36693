from temporalalignnet_tpu.models.transformer import (
    TemporalEncoder,
    ResidualAttentionBlock,
    quick_gelu,
)
from temporalalignnet_tpu.models.posenc import (
    sine_position_embedding,
    linear_interpolate,
)
from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer, Word2VecEncoder
from temporalalignnet_tpu.models.tan import TemporalAligner

__all__ = [
    "TemporalEncoder",
    "ResidualAttentionBlock",
    "quick_gelu",
    "sine_position_embedding",
    "linear_interpolate",
    "Word2VecTokenizer",
    "Word2VecEncoder",
    "TemporalAligner",
]
