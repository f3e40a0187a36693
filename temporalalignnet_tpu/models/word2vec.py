"""Word2vec (MIL-NCE) sentence encoder and tokenizer.

Parity targets:
- tokenizer: regex word split ``[\\w']+`` lowercase, dict lookup with OOV->0,
  pad/truncate to max_words, HF-like dict output
  (reference: model/word2vec_model.py:26-73; vocab token = index+1,
  model/s3d_milnce/s3dg.py:200-204).
- encoder: frozen word embedding (no-grad), fc1+ReLU, masked max-pool over words
  (padding filled with -6e4; all-padding sentences get the mask forced open),
  fc2 -> 512-d; returns {last_hidden_state, pooler_output}
  (reference: model/word2vec_model.py:84-102).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MASK_VALUE = -6.0e4

_WORD_RE = re.compile(r"[\w']+")


class Word2VecTokenizer:
    """Vocab-dict tokenizer with fixed-length output (word2vec_model.py:26-73).

    ``vocab`` is either a list of words (token = index + 1, matching the MIL-NCE
    s3d_dict.npy convention) or a path to that .npy file.
    """

    def __init__(self, vocab: Union[str, Sequence[str]], max_words: int = 32):
        if isinstance(vocab, str):
            words = np.load(vocab)
        else:
            words = vocab
        self.word_to_token = {str(w): i + 1 for i, w in enumerate(words)}
        self.vocab_size = len(self.word_to_token) + 1  # +1 for pad/OOV token 0
        self.max_words = max_words

    def _split(self, sentence: str) -> List[str]:
        return _WORD_RE.findall(str(sentence).lower())

    def _words_to_ids(self, words: List[str]) -> List[int]:
        ids = [self.word_to_token.get(w, 0) for w in words[: self.max_words]]
        ids += [0] * (self.max_words - len(ids))
        return ids

    def __call__(
        self, inputs: Union[str, Sequence[str]], padding: bool = True, **kwargs
    ) -> Dict[str, np.ndarray]:
        assert padding, "only padded output is supported"
        if isinstance(inputs, str):
            inputs = [inputs]
        ids = np.asarray([self._words_to_ids(self._split(s)) for s in inputs], np.int32)
        mask = (ids != 0).astype(np.int32)
        return {"input_ids": ids, "attention_mask": mask}


class Word2VecEncoder(nn.Module):
    """embed -> fc1 -> ReLU -> masked max-pool -> fc2 (word2vec_model.py:84-102).

    MIL-NCE dims: vocab 66250+1 x 300 embedding, fc1 300->2048, fc2 2048->512
    (s3dg.py:186-199).  The word embedding is frozen in the reference
    (word2vec_model.py:85-86); here the train step applies a zero-gradient mask to
    the ``word_embd`` param instead (functionally identical, optax-native).
    """

    vocab_size: int = 66251
    word_dim: int = 300
    hidden_dim: int = 2048
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        embed = nn.Embed(
            self.vocab_size,
            self.word_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="word_embd",
        )
        x = embed(input_ids)
        x = jax.lax.stop_gradient(x)  # frozen embedding (word2vec_model.py:85-86)
        x = nn.relu(
            nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        )
        if attention_mask is not None:
            # all-padding sentences (e.g. all stop words) keep every position
            # (word2vec_model.py:95)
            keep = attention_mask.astype(bool)
            all_pad = ~jnp.any(keep, axis=-1, keepdims=True)
            keep = keep | all_pad
            x_masked = jnp.where(keep[..., None], x, MASK_VALUE)
            pooled = jnp.max(x_masked, axis=-2)
        else:
            pooled = jnp.max(x, axis=-2)
        fc2 = nn.Dense(
            self.output_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2"
        )
        return {
            "last_hidden_state": fc2(x),
            "pooler_output": fc2(pooled),
        }
