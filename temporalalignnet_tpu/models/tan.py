"""TemporalAligner — the TAN model, TPU-first.

Parity targets (reference: model/tan_model.py):
- dual video self-attention encoder + joint [video || text] encoder, both returning
  per-layer taps (tan_model.py:43-46, 100-149).
- 1024-slot learned/sine temporal pos-enc with random start offset during training
  (tan_model.py:57-66, 162-166) and linear interpolation for eval windows != 64
  (tan_model.py:157-160).
- per-layer cosine-similarity logits: dual einsum astc,bkc->astbk (tan_model.py:118),
  joint astc,bskc->astbk (tan_model.py:138).
- optional binary alignability head (tan_model.py:69-72, 146-148).
- CLIP-style init scaling for attention/MLP kernels (tan_model.py:76-97).

Differences by design (TPU-first, union semantics per SURVEY §2.9):
- batch-first [B, T, C] layout everywhere (no TBC permutes).
- the EMA twin is NOT a module pair: it is a second param pytree updated by
  jax.tree_util.tree_map in the train step (see train/train_step.py), replacing
  TwinTemporalAligner (tan_model.py:315-351).
- eval similarity methods take explicit padding masks so variable-length windows and
  ragged sentence sets become fixed-shape masked batches (vmappable).
- the reference's unused ``self.mlp`` Linear (tan_model.py:68) is not instantiated;
  the checkpoint converter drops its weights.
- randomness comes from an explicit 'pos' rng collection instead of np.random inside
  forward (tan_model.py:162-166).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from temporalalignnet_tpu.core.config import ModelConfig
from temporalalignnet_tpu.models.posenc import linear_interpolate, sine_position_embedding
from temporalalignnet_tpu.models.transformer import TemporalEncoder


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """x / ||x|| — matches torch ``x / x.norm(dim=-1, keepdim=True)`` (no eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


class TemporalAligner(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False  # rematerialize encoder blocks in backward

    def setup(self):
        cfg = self.cfg
        width = cfg.width

        # CLIP-style init stds (tan_model.py:85-87)
        proj_std = (width**-0.5) * ((2 * cfg.num_joint_layers) ** -0.5)
        attn_std = width**-0.5
        fc_std = (2 * width) ** -0.5

        def encoder(layers, name):
            return TemporalEncoder(
                width=width,
                layers=layers,
                heads=cfg.heads,
                mlp_ratio=cfg.mlp_ratio,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_pallas=self.use_pallas,
                attn_std=attn_std,
                proj_std=proj_std,
                fc_std=fc_std,
                remat=self.remat,
                name=name,
            )

        self.video_temporal_encoder = encoder(cfg.num_encoder_layers, "video_temporal_encoder")
        self.joint_temporal_encoder = encoder(cfg.num_joint_layers, "joint_temporal_encoder")

        self.video_pre_proj = nn.Dense(
            width,
            use_bias=False,
            kernel_init=_normal_init(0.01),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="video_pre_proj",
        )
        self.text_pre_proj = nn.Dense(
            width,
            use_bias=False,
            kernel_init=_normal_init(0.01),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="text_pre_proj",
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.ln_text_init = ln("ln_text_init")
        self.ln_video_init = ln("ln_video_init")
        self.ln_position_init = ln("ln_position_init")
        self.ln_video_post_enc = ln("ln_video_post_enc")
        self.ln_joint_post_enc = ln("ln_joint_post_enc")

        if cfg.pos_enc == "learned":
            self.temporal_pos_embed = self.param(
                "temporal_pos_embed",
                _normal_init(0.01),
                (cfg.num_pos_embeds, width),
                self.param_dtype,
            )
        elif cfg.pos_enc == "sine":
            self.temporal_pos_embed = sine_position_embedding(width, cfg.num_pos_embeds)
        else:
            raise ValueError(cfg.pos_enc)

        self.text_temporal_pos_embed = self.param(
            "text_temporal_pos_embed",
            _normal_init(0.01),
            (cfg.num_pos_embeds, width),
            self.param_dtype,
        )

        if cfg.use_alignability_head:
            self.binary_head = nn.Dense(
                1,
                kernel_init=_normal_init(0.01),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="binary_head",
            )

    # ------------------------------------------------------------------ helpers

    def _pos_start(self, limit: int, deterministic: bool) -> jnp.ndarray:
        """Random positional-table start offset in [0, limit) during training
        (tan_model.py:162-166); 0 otherwise."""
        if deterministic or not self.cfg.random_pos_start or limit <= 1:
            return jnp.zeros((), jnp.int32)
        return jax.random.randint(self.make_rng("pos"), (), 0, limit)

    def _video_pos_embed(
        self,
        T: int,
        interpolate_from: Optional[int],
        deterministic: bool,
        effective_len=None,
    ):
        table = jnp.asarray(self.temporal_pos_embed, self.dtype)
        if interpolate_from:
            return linear_interpolate(table[:interpolate_from], T, effective_len)
        start = self._pos_start(T // 2, deterministic)
        return jax.lax.dynamic_slice_in_dim(table, start, T, axis=0)

    # ------------------------------------------------------------- feature paths

    def get_visual_feature(
        self,
        video_embed: jnp.ndarray,  # [B, T, Cv]
        video_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = pad
        interpolate_from: Optional[int] = None,
        deterministic: bool = True,
        effective_len=None,
    ) -> jnp.ndarray:
        """Dual-branch video features, all layers: [B, S, T, C] (tan_model.py:152-179)."""
        x = self.ln_video_init(self.video_pre_proj(video_embed))
        B, T, _ = x.shape
        pos = self._video_pos_embed(T, interpolate_from, deterministic, effective_len)
        x = x + self.ln_position_init(pos)[None]
        if self.cfg.num_encoder_layers == 0:
            return x[:, None]  # [B, 1, T, C] raw-feature fallback (tan_model.py:177-179)
        taps = self.video_temporal_encoder(x, video_padding_mask)
        taps[-1] = self.ln_video_post_enc(taps[-1])
        return jnp.stack(taps, axis=1)  # [B, S, T, C]

    def get_textual_feature(self, lang_embed: jnp.ndarray) -> jnp.ndarray:
        """proj + LN (tan_model.py:231-234). lang_embed: [..., Ct] -> [..., C]."""
        return self.ln_text_init(self.text_pre_proj(lang_embed))

    def get_textual_feature_with_time(
        self,
        lang_embed: jnp.ndarray,  # [B, N, Ct]
        interpolate_from: Optional[int] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Text features + text temporal pos-enc (tan_model.py:212-228)."""
        x = self.get_textual_feature(lang_embed)
        N = x.shape[1]
        table = jnp.asarray(self.text_temporal_pos_embed, self.dtype)
        if interpolate_from:
            pos = linear_interpolate(table[:interpolate_from], N)
        else:
            start = self._pos_start(N // 2, deterministic)
            pos = jax.lax.dynamic_slice_in_dim(table, start, N, axis=0)
        return x + self.ln_position_init(pos)[None]

    def get_joint_feature(
        self,
        video_embed: jnp.ndarray,  # [B, T, Cv]
        video_padding_mask: Optional[jnp.ndarray],
        lang_embed_with_time: jnp.ndarray,  # [B, N, C] (already projected)
        lang_padding_mask: Optional[jnp.ndarray],
        interpolate_from: Optional[int] = None,
        deterministic: bool = True,
        effective_len=None,
    ):
        """Joint encoder over [video || text]; returns ([B,S,T,C], [B,S,N,C])
        (tan_model.py:182-209)."""
        x = self.ln_video_init(self.video_pre_proj(video_embed))
        B, T, _ = x.shape
        N = lang_embed_with_time.shape[1]
        pos = self._video_pos_embed(T, interpolate_from, deterministic, effective_len)
        x = x + self.ln_position_init(pos)[None]

        joint = jnp.concatenate([x, lang_embed_with_time], axis=1)
        if video_padding_mask is None:
            video_padding_mask = jnp.zeros((B, T), bool)
        if lang_padding_mask is None:
            lang_padding_mask = jnp.zeros((B, N), bool)
        joint_mask = jnp.concatenate([video_padding_mask, lang_padding_mask], axis=1)

        taps = self.joint_temporal_encoder(joint, joint_mask)
        taps[-1] = self.ln_joint_post_enc(taps[-1])
        out = jnp.stack(taps, axis=1)  # [B, S, T+N, C]
        return out[:, :, :T], out[:, :, T:]

    # ----------------------------------------------------------------- forward

    def __call__(
        self,
        video_embed: jnp.ndarray,  # [B, T, Cv]
        lang_embed: jnp.ndarray,  # [B, N, Ct]
        video_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = pad
        lang_padding_mask: Optional[jnp.ndarray] = None,  # [B, N] True = pad
        interpolate_from: Optional[int] = None,
        deterministic: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Training forward: cross-batch per-layer logits (tan_model.py:100-149)."""
        cfg = self.cfg
        video_out = self.get_visual_feature(
            video_embed, video_padding_mask, interpolate_from, deterministic
        )
        lang_raw = self.get_textual_feature(lang_embed)  # [B, N, C]

        video_norm = l2_normalize(video_out)
        text_norm = l2_normalize(lang_raw)
        if not cfg.fused_milnce:
            logits_dual = jnp.einsum(
                "astc,bkc->astbk",
                video_norm,
                text_norm,
                preferred_element_type=jnp.float32,
            )

        if cfg.use_text_pos_enc:
            lang_with_time = self.get_textual_feature_with_time(
                lang_embed, interpolate_from, deterministic
            )
        else:
            lang_with_time = lang_raw

        joint_video, joint_text = self.get_joint_feature(
            video_embed,
            video_padding_mask,
            lang_with_time,
            lang_padding_mask,
            interpolate_from,
            deterministic,
        )
        joint_video_norm = l2_normalize(joint_video)
        joint_text_norm = l2_normalize(joint_text)
        if cfg.fused_milnce:
            # the fused-loss contract: hand per-layer normalized features to
            # losses/tan_loss.py, which computes the cross-batch logsumexps in
            # the Pallas kernel — the [B,S,T,B,N] tensors never materialize
            out: Dict[str, jnp.ndarray] = {
                "dual_feature_video": video_norm,
                "dual_feature_text": text_norm,
                "joint_feature_video": joint_video_norm,
                "joint_feature_text": joint_text_norm,
            }
            if cfg.use_alignability_head:
                out["dual_logits_alignability"] = self.binary_head(lang_raw)
                out["joint_logits_alignability"] = self.binary_head(joint_text)
            return out
        logits_joint = jnp.einsum(
            "astc,bskc->astbk",
            joint_video_norm,
            joint_text_norm,
            preferred_element_type=jnp.float32,
        )

        out = {
            "logits_dual": logits_dual,
            "logits_joint": logits_joint,
        }
        if cfg.return_dual_feature:
            out["dual_feature_video"] = video_norm
            out["dual_feature_text"] = text_norm
        if cfg.use_alignability_head:
            out["dual_logits_alignability"] = self.binary_head(lang_raw)  # [B, N, 1]
            out["joint_logits_alignability"] = self.binary_head(joint_text)  # [B, S, N, 1]
        return out

    # -------------------------------------------------------------- eval methods

    def get_text_visual_sims(
        self,
        video_embed: jnp.ndarray,  # [B, T, Cv]
        lang_embed: jnp.ndarray,  # [B, N, Ct]
        video_padding_mask: Optional[jnp.ndarray] = None,
        lang_padding_mask: Optional[jnp.ndarray] = None,
        interpolate_from: Optional[int] = None,
        effective_len=None,
    ) -> Dict[str, jnp.ndarray]:
        """Fused eval path: joint sim, dual sim, and alignability logits in one pass.

        Replaces the reference's separate get_text_visual_sim_joint /
        get_text_visual_sim_dual / get_alignability calls (tan_model.py:237-312),
        which each redundantly re-encode; on TPU this is one batched jit call.
        Returns per-layer sims [B, S, T, N] ('sim' joint, 'dual-sim') and, when the
        head exists, 'alignability-dual' [B, N, 1] / 'alignability-joint' [B, S, N, 1].
        """
        text_if = None
        vid_if = interpolate_from
        if isinstance(interpolate_from, (tuple, list)):
            vid_if, text_if = interpolate_from

        lang_raw = self.get_textual_feature(lang_embed)
        if self.cfg.use_text_pos_enc:
            lang_with_time = self.get_textual_feature_with_time(
                lang_embed, text_if, deterministic=True
            )
        else:
            lang_with_time = lang_raw

        video_out = self.get_visual_feature(
            video_embed, video_padding_mask, vid_if, deterministic=True,
            effective_len=effective_len,
        )
        joint_video, joint_text = self.get_joint_feature(
            video_embed,
            video_padding_mask,
            lang_with_time,
            lang_padding_mask,
            vid_if,
            deterministic=True,
            effective_len=effective_len,
        )

        dual_sim = jnp.einsum(
            "bstc,bkc->bstk",
            l2_normalize(video_out),
            l2_normalize(lang_raw),
            preferred_element_type=jnp.float32,
        )
        joint_sim = jnp.einsum(
            "bstc,bskc->bstk",
            l2_normalize(joint_video),
            l2_normalize(joint_text),
            preferred_element_type=jnp.float32,
        )
        out = {"sim": joint_sim, "dual-sim": dual_sim}
        if self.cfg.use_alignability_head:
            out["alignability-dual"] = self.binary_head(lang_raw)
            out["alignability-joint"] = self.binary_head(joint_text)
        return out

    def get_text_visual_sim_joint(
        self,
        video_embed,
        lang_embed,
        video_padding_mask=None,
        lang_padding_mask=None,
        interpolate_from=None,
    ):
        """Per-layer joint sim [B, S, T, N] (tan_model.py:237-264)."""
        return self.get_text_visual_sims(
            video_embed, lang_embed, video_padding_mask, lang_padding_mask, interpolate_from
        )["sim"]

    def get_text_visual_sim_dual(
        self, video_embed, lang_embed, video_padding_mask=None, interpolate_from=None
    ):
        """Per-layer dual sim [B, S, T, N] (tan_model.py:267-283)."""
        lang_raw = self.get_textual_feature(lang_embed)
        video_out = self.get_visual_feature(
            video_embed, video_padding_mask, interpolate_from, deterministic=True
        )
        return jnp.einsum(
            "bstc,bkc->bstk",
            l2_normalize(video_out),
            l2_normalize(lang_raw),
            preferred_element_type=jnp.float32,
        )

    def get_alignability(
        self,
        video_embed,
        lang_embed,
        video_padding_mask=None,
        lang_padding_mask=None,
        interpolate_from=None,
    ):
        """Binary-head alignability logits (tan_model.py:286-312)."""
        sims = self.get_text_visual_sims(
            video_embed, lang_embed, video_padding_mask, lang_padding_mask, interpolate_from
        )
        return {
            "alignability-dual": sims["alignability-dual"],
            "alignability-joint": sims["alignability-joint"],
        }
