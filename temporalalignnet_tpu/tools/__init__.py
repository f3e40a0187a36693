from temporalalignnet_tpu.tools.filters import (
    filter_language,
    filter_length,
    merge_linebreaks,
)
from temporalalignnet_tpu.tools.sentencify import HFPunctuator, Sentencify

__all__ = [
    "filter_language",
    "filter_length",
    "merge_linebreaks",
    "HFPunctuator",
    "Sentencify",
]
