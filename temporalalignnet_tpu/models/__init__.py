from temporalalignnet_tpu.models.baseline import RawFeatureBaseline
from temporalalignnet_tpu.models.clip_text import CLIPTextEncoder, CLIPTokenizer
from temporalalignnet_tpu.models.clip_vit import CLIPImageEncoder
from temporalalignnet_tpu.models.net import BertEncoder, TANWithText
from temporalalignnet_tpu.models.posenc import (
    linear_interpolate,
    position_embedding_sine_from_mask,
    sine_position_embedding,
)
from temporalalignnet_tpu.models.s3d import S3D, space_to_depth
from temporalalignnet_tpu.models.tan import TemporalAligner
from temporalalignnet_tpu.models.timesformer import TimeSformerEncoder
from temporalalignnet_tpu.models.transformer import (
    ResidualAttentionBlock,
    TemporalDecoder,
    TemporalEncoder,
    quick_gelu,
)
from temporalalignnet_tpu.models.word2vec import Word2VecEncoder, Word2VecTokenizer

__all__ = [
    "CLIPImageEncoder",
    "CLIPTextEncoder",
    "CLIPTokenizer",
    "TimeSformerEncoder",
    "TemporalEncoder",
    "TemporalDecoder",
    "ResidualAttentionBlock",
    "quick_gelu",
    "sine_position_embedding",
    "position_embedding_sine_from_mask",
    "linear_interpolate",
    "Word2VecTokenizer",
    "Word2VecEncoder",
    "TemporalAligner",
    "TANWithText",
    "BertEncoder",
    "RawFeatureBaseline",
    "S3D",
    "space_to_depth",
]
