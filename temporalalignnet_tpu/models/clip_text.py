"""CLIP text tower + BPE tokenizer — the CLIP-baseline text side.

The reference's CLIP baseline encodes the HTM-Align captions at eval time
with ``clip.tokenize`` + ``clipmodel.encode_text``
(/root/reference/eval/eval_zeroshot_align.py:294-327); without a text tower
the CLIP rows of BASELINE.md are not reproducible from raw data.  This module
is the TPU-native equivalent:

- ``CLIPTextEncoder``: causal pre-LN transformer (the same
  ResidualAttentionBlock the aligner and image tower use), learned positions,
  ln_final, EOT pooling, linear projection.  Weights convert from any HF
  CLIPTextModel(/WithProjection) / full CLIPModel state_dict via
  checkpoint/clip_convert.py::clip_text_torch_to_params.
- ``CLIPTokenizer``: the CLIP byte-BPE (lowercase + whitespace-clean, GPT-2
  byte-to-unicode table, ``</w>`` end-of-word merges, <|startoftext|> /
  <|endoftext|> wrapping, fixed context length with truncate-keeps-EOT),
  built from HF-style vocab.json + merges.txt or OpenAI's
  bpe_simple_vocab_16e6.txt.gz.  Drop-in for Word2VecTokenizer in the eval
  datasets (same ``__call__ -> {input_ids, attention_mask}`` contract).

EOT pooling has two published semantics and the checkpoint decides which:
OpenAI releases pool at ``argmax(input_ids)`` (EOT is the highest id;
eos_token_id=None here), while HF configs with a real ``eos_token_id``
(!= the legacy 2) pool at its first occurrence — matching HF
CLIPTextTransformer exactly (parity-tested in tests/test_clip_text.py).

ftfy text fixing (OpenAI's basic_clean) is not installed in this image and is
injection-gated like the sentencify punctuator: when absent, cleaning is
html-unescape + whitespace collapse, which is identical on ASCII captions.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
from typing import Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from temporalalignnet_tpu.models.transformer import ResidualAttentionBlock


class CLIPTextEncoder(nn.Module):
    """Causal transformer text encoder, [B, L] int ids -> [B, embed_dim].

    Defaults are the ViT-B/32 text stack (width 512, 12x8, 77 context,
    512-d projection); L/14's is width 768, 12 layers, 12 heads, 768-d.
    """

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512  # projection output; 0 = return ln_final(eot) [width]
    dtype: jnp.dtype = jnp.float32
    # see module docstring: must match the checkpoint's config.hidden_act
    hidden_act: str = "quick_gelu"
    # None = OpenAI pooling (argmax of ids: EOT is the highest id).  An HF
    # config's eos_token_id pools at its first occurrence instead (required
    # when the tokenizer pads with EOT, as HF's does).
    eos_token_id: Optional[int] = None

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask=None
    ) -> jnp.ndarray:
        # attention_mask is accepted for tokenizer/evaluator interface
        # compatibility and ignored: CLIP's text transformer is causal-only
        # (padding positions attend but are never pooled — clip/model.py and
        # HF CLIPTextTransformer with attention_mask=None behave the same).
        L = input_ids.shape[-1]
        x = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[:L].astype(x.dtype)
        for i in range(self.layers):
            x, _ = ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype,
                act=self.hidden_act, causal=True, name=f"resblocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        if self.eos_token_id is None:
            idx = jnp.argmax(input_ids, axis=-1)
        else:
            idx = jnp.argmax(
                (input_ids == self.eos_token_id).astype(jnp.int32), axis=-1
            )
        pooled = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        if self.embed_dim:
            pooled = nn.Dense(
                self.embed_dim, use_bias=False, dtype=self.dtype, name="proj"
            )(pooled)
        return pooled


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

SOT = "<|startoftext|>"
EOT = "<|endoftext|>"


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte -> printable-unicode table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(a, b) for a, b in zip(word, word[1:])}


def _basic_clean(text: str) -> str:
    try:  # injection-gated: not installed in this image (identical on ASCII)
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text)).strip()


@functools.lru_cache()
def _token_pattern():
    import regex  # \p{L}/\p{N} classes; stdlib re has no unicode properties

    return regex.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        regex.IGNORECASE,
    )


class CLIPTokenizer:
    """CLIP byte-BPE with the Word2VecTokenizer call contract.

    ``vocab``: token->id dict or path to an HF vocab.json;
    ``merges``: ordered merge-pair list or path to an HF merges.txt
    (``#version`` header lines skipped).  For OpenAI's released
    ``bpe_simple_vocab_16e6.txt.gz`` use :meth:`from_openai_bpe`, which also
    reconstructs the vocab the way ``clip.simple_tokenizer`` does.
    """

    def __init__(
        self,
        vocab: Union[str, Dict[str, int]],
        merges: Union[str, Sequence[Tuple[str, str]]],
        context_length: int = 77,
    ):
        if isinstance(vocab, str):
            with open(vocab, encoding="utf-8") as f:
                vocab = json.load(f)
        if isinstance(merges, str):
            with open(merges, encoding="utf-8") as f:
                merges = [
                    tuple(line.split())
                    for line in f.read().split("\n")
                    if line and not line.startswith("#version")
                ]
        self.encoder: Dict[str, int] = dict(vocab)
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.context_length = context_length
        self.max_words = context_length  # Word2VecTokenizer-interface alias
        self.vocab_size = len(self.encoder)
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self._cache: Dict[str, str] = {SOT: SOT, EOT: EOT}

    @classmethod
    def from_openai_bpe(cls, path: str, context_length: int = 77):
        """Build from OpenAI's bpe_simple_vocab_16e6.txt.gz: line 0 is a
        version banner; merges are lines 1 .. 49152-256-2; the vocab is
        bytes + bytes</w> + joined merges + the two specials (the exact
        construction in clip/simple_tokenizer.py)."""
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = [tuple(m.split()) for m in lines[1 : 49152 - 256 - 2 + 1] if m]
        chars = list(bytes_to_unicode().values())
        vocab_list = chars + [c + "</w>" for c in chars]
        vocab_list += ["".join(m) for m in merges]
        vocab_list += [SOT, EOT]
        vocab = {tok: i for i, tok in enumerate(vocab_list)}
        return cls(vocab, merges, context_length)

    def bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        import re

        text = re.sub(r"\s+", " ", _basic_clean(text)).strip().lower()
        ids: List[int] = []
        for token in _token_pattern().findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def _to_fixed(self, ids: List[int]) -> Tuple[List[int], int]:
        ids = [self.sot_id] + ids + [self.eot_id]
        if len(ids) > self.context_length:  # truncate keeps EOT (clip.tokenize)
            ids = ids[: self.context_length]
            ids[-1] = self.eot_id
        n = len(ids)
        return ids + [0] * (self.context_length - n), n

    def __call__(
        self, inputs: Union[str, Sequence[str]], padding: bool = True, **kwargs
    ) -> Dict[str, np.ndarray]:
        assert padding, "only padded output is supported"
        if isinstance(inputs, str):
            inputs = [inputs]
        rows, lens = zip(*(self._to_fixed(self.encode(s)) for s in inputs))
        ids = np.asarray(rows, np.int32)
        # pad id 0 is a REAL byte token ('!'), so the mask comes from the
        # true lengths, not from ids != 0 (unlike the word2vec tokenizer)
        mask = (
            np.arange(self.context_length)[None, :] < np.asarray(lens)[:, None]
        ).astype(np.int32)
        return {"input_ids": ids, "attention_mask": mask}
