"""TANWithText — TemporalAligner + language model as one trainable module.

The reference keeps the language model as an attribute of the aligner
(``self.bert``, accessed as ``model.lang_model`` from the trainer — the §2.9 API
skew) and encodes flattened ragged sentences (train/main.py:52-65).  Here text is
fixed-shape [B, N, W] tokens; the encoder runs on the flattened [B*N, W] batch in
the same jit program as the aligner — one fused TPU step, no re-padding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from temporalalignnet_tpu.core.config import ModelConfig
from temporalalignnet_tpu.models.tan import TemporalAligner
from temporalalignnet_tpu.models.word2vec import Word2VecEncoder


class BertEncoder(nn.Module):
    """HF Flax BERT bridge for language_model='bert' (tan_model.py:37-38).

    Wraps transformers' FlaxBertModule as a submodule so the whole TAN trains
    as one pjit program.  Pass ``hf_config`` (a transformers BertConfig) —
    defaults to bert-base-uncased dimensions; load pretrained weights by
    grafting a converted HF param tree under ``lang_model`` (use
    transformers.FlaxBertModel.from_pretrained on a LOCAL directory, then
    ``params['lang_model'] = flax_bert.params`` — no egress in this image).
    Returns the HF-style {last_hidden_state, pooler_output} dict.
    """

    hf_config: Any = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from transformers import BertConfig
        from transformers.models.bert.modeling_flax_bert import FlaxBertModule

        cfg = self.hf_config or BertConfig()
        self.bert = FlaxBertModule(config=cfg, dtype=self.dtype)

    def __call__(self, input_ids, attention_mask=None):
        out = self.bert(
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=jnp.zeros_like(input_ids),
            position_ids=jnp.broadcast_to(
                jnp.arange(input_ids.shape[-1]), input_ids.shape
            ),
            head_mask=None,
        )
        return {
            "last_hidden_state": out.last_hidden_state,
            "pooler_output": out.pooler_output,
        }


class TANWithText(nn.Module):
    cfg: ModelConfig
    vocab_size: int = 66251
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False  # rematerialize aligner encoder blocks in backward
    bert_config: Any = None  # transformers BertConfig for language_model='bert'

    def setup(self):
        if self.cfg.language_model == "word2vec":
            self.lang_model = Word2VecEncoder(
                vocab_size=self.vocab_size,
                output_dim=self.cfg.text_embed_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="lang_model",
            )
        elif self.cfg.language_model == "bert":
            self.lang_model = BertEncoder(
                hf_config=self.bert_config, dtype=self.dtype, name="lang_model"
            )
        else:
            raise NotImplementedError(
                f"language_model={self.cfg.language_model!r}"
            )
        self.aligner = TemporalAligner(
            self.cfg,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
            name="aligner",
        )

    def encode_text(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray):
        """[..., W] tokens -> [..., C] pooled sentence embeddings."""
        lead = input_ids.shape[:-1]
        W = input_ids.shape[-1]
        out = self.lang_model(input_ids.reshape(-1, W), attention_mask.reshape(-1, W))
        return out["pooler_output"].reshape(*lead, -1)

    def __call__(
        self,
        video: jnp.ndarray,  # [B, T, Cv]
        input_ids: jnp.ndarray,  # [B, N, W]
        video_padding_mask: Optional[jnp.ndarray] = None,
        lang_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        attention_mask = (input_ids != 0).astype(jnp.int32)
        text_embed = self.encode_text(input_ids, attention_mask)
        return self.aligner(
            video,
            text_embed,
            video_padding_mask=video_padding_mask,
            lang_padding_mask=lang_padding_mask,
            deterministic=deterministic,
        )

    # ---- eval entry points (used by temporalalignnet_tpu/eval) ----

    def text_visual_sims(
        self,
        video: jnp.ndarray,
        text_embed: jnp.ndarray,  # pre-encoded [B, N, C]
        video_padding_mask: Optional[jnp.ndarray] = None,
        lang_padding_mask: Optional[jnp.ndarray] = None,
        interpolate_from: Optional[int] = None,
        effective_len=None,
    ):
        return self.aligner.get_text_visual_sims(
            video,
            text_embed,
            video_padding_mask,
            lang_padding_mask,
            interpolate_from,
            effective_len=effective_len,
        )

    def visual_feature(
        self,
        video: jnp.ndarray,
        video_padding_mask: Optional[jnp.ndarray] = None,
        interpolate_from: Optional[int] = None,
        effective_len=None,
    ):
        return self.aligner.get_visual_feature(
            video,
            video_padding_mask,
            interpolate_from,
            deterministic=True,
            effective_len=effective_len,
        )

    def textual_feature(self, text_embed: jnp.ndarray):
        return self.aligner.get_textual_feature(text_embed)
