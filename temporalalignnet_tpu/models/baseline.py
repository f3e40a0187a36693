"""Raw-feature baseline model — the reference's standalone eval harnesses.

The reference scores raw MIL-NCE / CLIP features with no joint model as its
de-facto regression tests, with expected numbers in comments
(eval/eval_zeroshot_align.py:255-359: MIL-NCE overlap-seq R@1 0.342 / AUC 0.734;
eval/eval_zeroshot_retrieval.py:259-301).  This module provides the same
capability behind the SAME evaluator interface (encode_text /
text_visual_sims / visual_feature / textual_feature), so AlignmentEvaluator and
RetrievalEvaluator run unchanged:

    sim(t, n) = cos(raw_video_feature_t, text_tower(n))

with the text tower being the MIL-NCE word2vec Sentence_Embedding (load its
weights from s3d_howto100m.pth via checkpoint.load_milnce_checkpoint) or any
text encoder matching the feature space (CLIP text for CLIP features).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from temporalalignnet_tpu.core.config import ModelConfig
from temporalalignnet_tpu.models.tan import l2_normalize
from temporalalignnet_tpu.models.word2vec import Word2VecEncoder


class RawFeatureBaseline(nn.Module):
    """Evaluator-compatible module computing raw-feature similarities.

    MIL-NCE mode (reference eval_zeroshot_align.py:264-291): raw 1024-d S3D
    features pass through the MIL-NCE fc (1024 -> 512, ``use_visual_proj``)
    and meet the word2vec tower with DOT product (cfg.sim='dot').
    CLIP mode (:296-330): features meet the text tower directly with cosine
    (use_visual_proj=False, cfg.sim='cos').
    """

    cfg: ModelConfig
    vocab_size: int = 66251
    use_visual_proj: bool = True  # MIL-NCE fc 1024->512
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    # CLIP mode's text side (reference eval_zeroshot_align.py:294-330 encodes
    # captions with clip.encode_text): a zero-arg factory building the text
    # tower — e.g. lambda: CLIPTextEncoder(embed_dim=video_embed_dim) — whose
    # params graft under 'lang_model' (clip_text_torch_to_params output).
    # None = the MIL-NCE word2vec Sentence_Embedding.
    text_tower: Optional[Callable[[], nn.Module]] = None

    def setup(self):
        # without the visual projection, text must land in the feature space
        out_dim = self.embed_dim if self.use_visual_proj else self.cfg.video_embed_dim
        if self.text_tower is not None:
            self.lang_model = self.text_tower()
        else:
            self.lang_model = Word2VecEncoder(
                vocab_size=self.vocab_size,
                output_dim=out_dim,
                dtype=self.dtype,
                name="lang_model",
            )
        if self.use_visual_proj:
            self.visual_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                        name="visual_proj")

    def _project(self, video):
        v = video.astype(jnp.float32)
        if self.use_visual_proj:
            v = self.visual_proj(v)
        return v

    def _norm(self, x):
        return l2_normalize(x) if self.cfg.sim == "cos" else x

    def encode_text(self, input_ids, attention_mask):
        lead = input_ids.shape[:-1]
        W = input_ids.shape[-1]
        out = self.lang_model(input_ids.reshape(-1, W), attention_mask.reshape(-1, W))
        if isinstance(out, dict):  # word2vec tower; CLIP returns the array
            out = out["pooler_output"]
        return out.reshape(*lead, -1)

    def __call__(self, video, input_ids, deterministic=True, **kw):
        mask = (input_ids != 0).astype(jnp.int32)
        text = self.encode_text(input_ids, mask)
        sims = self.text_visual_sims(video, text)
        return {"logits_dual": sims["dual-sim"], "logits_joint": sims["sim"]}

    def text_visual_sims(
        self,
        video: jnp.ndarray,  # [B, T, Cv] raw features
        text_embed: jnp.ndarray,  # [B, N, C]
        video_padding_mask: Optional[jnp.ndarray] = None,
        lang_padding_mask: Optional[jnp.ndarray] = None,
        interpolate_from=None,
        effective_len=None,
    ) -> Dict[str, jnp.ndarray]:
        sim = jnp.einsum(
            "btc,bkc->btk",
            self._norm(self._project(video)),
            self._norm(text_embed.astype(jnp.float32)),
            preferred_element_type=jnp.float32,
        )[:, None]  # single "layer" tap: [B, 1, T, N]
        return {"sim": sim, "dual-sim": sim}

    def visual_feature(self, video, video_padding_mask=None, interpolate_from=None,
                       effective_len=None):
        return self._project(video)[:, None]  # [B, 1, T, C]

    def textual_feature(self, text_embed):
        return text_embed
