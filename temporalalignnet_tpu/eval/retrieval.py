"""Zero-shot YouCook2 text->video retrieval (reference: eval/eval_zeroshot_retrieval.py:157-256).

Per clip annotation: encode `num_clips` staggered windows with the dual video
encoder (last layer), keep only the annotated segment, l2-normalize per timestep
then average over time and clips, dot against pooled text features; report raw,
mean-centered, and standardized R1/R5/R10/MR.

TPU-shaped: windows are already a batch dim; variable window lengths pad to a
bucket with masks + traced effective length for pos-enc interpolation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from temporalalignnet_tpu.core.config import EvalConfig
from temporalalignnet_tpu.eval.metrics import retrieval_metrics
from temporalalignnet_tpu.models.net import TANWithText


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sample_clip_windows(
    feature: np.ndarray,  # [vlen, C]
    start: float,
    end: float,
    num_clips: int = 10,
):
    """Adaptive multi-window sampling (eval_zeroshot_retrieval.py:105-141):
    chosen_vlen = clip(2*duration, 32, 256); windows staggered to cover (or tile)
    the annotated segment.  Returns (windows [num_clips, L, C], start_idx, end_idx).
    """
    vlen = feature.shape[0]
    duration = int(np.floor(end - start))
    chosen_vlen = int(np.clip(duration * 2, 32, 256))
    if chosen_vlen >= duration:
        lead = np.floor(
            np.linspace(0.25 * (chosen_vlen - duration), 0.75 * (chosen_vlen - duration), num_clips)
        ).astype(int)
        chosen_start = int(start) - lead
        start_idx, end_idx = lead, lead + duration
    else:
        lag = np.floor(
            np.linspace(0.25 * (duration - chosen_vlen), 0.75 * (duration - chosen_vlen), num_clips)
        ).astype(int)
        chosen_start = int(start) + lag
        start_idx = np.zeros_like(lag)
        end_idx = np.zeros_like(lag) + chosen_vlen
    idx = chosen_start[:, None] + np.arange(chosen_vlen)[None, :]
    idx = np.clip(idx, 0, vlen - 1)
    return feature[idx], start_idx, end_idx


class RetrievalEvaluator:
    def __init__(self, model: TANWithText, params, cfg: EvalConfig):
        self.model = model
        self.params = params
        self.cfg = cfg
        seq_len = cfg.seq_len

        def clip_feature(params, windows, win_pad, seg_mask, eff_len, interpolate: bool):
            # windows [K, L, C]; seg_mask True inside the annotated segment
            feats = model.apply(
                {"params": params},
                windows,
                video_padding_mask=win_pad,
                interpolate_from=seq_len if interpolate else None,
                effective_len=eff_len if interpolate else None,
                method="visual_feature",
            )[:, -1]  # last layer [K, L, C]
            # norm first, then avg over segment time and clips (:201-203)
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            m = seg_mask[:, :, None].astype(feats.dtype)
            per_clip = jnp.sum(feats * m, axis=1) / jnp.clip(
                jnp.sum(m, axis=1), 1e-6
            )
            pooled = jnp.mean(per_clip, axis=0)
            return pooled / jnp.linalg.norm(pooled)

        def text_feature(params, input_ids):
            mask = (input_ids != 0).astype(jnp.int32)
            emb = model.apply(
                {"params": params}, input_ids, mask, method="encode_text"
            )
            feat = model.apply(
                {"params": params}, emb, method="textual_feature"
            )
            return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

        self._clip_feature = jax.jit(clip_feature, static_argnums=(5,))
        self._text_feature = jax.jit(text_feature)

    def evaluate(self, items: Sequence[Dict]) -> Dict[str, float]:
        """items: {'video': [vlen,C], 'start', 'end', 'input_ids': [W] int}."""
        cfg = self.cfg
        vis, txt = [], []
        for it in items:
            windows, s_idx, e_idx = sample_clip_windows(
                np.asarray(it["video"], np.float32),
                it["start"],
                it["end"],
                cfg.num_clips,
            )
            K, L, C = windows.shape
            Lb = _round_up(L, 32)
            wb = np.zeros((K, Lb, C), np.float32)
            wb[:, :L] = windows
            wpad = np.broadcast_to(np.arange(Lb) >= L, (K, Lb)).copy()
            seg = np.zeros((K, Lb), bool)
            for k in range(K):
                seg[k, s_idx[k] : e_idx[k]] = True
            interpolate = L >= cfg.seq_len  # (:181-184)
            v = self._clip_feature(
                self.params,
                jnp.asarray(wb),
                jnp.asarray(wpad),
                jnp.asarray(seg),
                jnp.asarray(L, jnp.int32),
                interpolate,
            )
            vis.append(np.asarray(v))
            t = self._text_feature(
                self.params, jnp.asarray(it["input_ids"], np.int32)[None]
            )
            txt.append(np.asarray(t)[0])

        V = np.stack(vis)  # [Q, C]
        X = np.stack(txt)
        out = retrieval_metrics(X @ V.T)
        Vc, Xc = V - V.mean(0, keepdims=True), X - X.mean(0, keepdims=True)
        out.update(retrieval_metrics(Xc @ Vc.T, prefix="C-"))
        Vsd = np.where(Vc.std(0, keepdims=True) == 0, 1.0, Vc.std(0, keepdims=True))
        Xsd = np.where(Xc.std(0, keepdims=True) == 0, 1.0, Xc.std(0, keepdims=True))
        Vs, Xs = Vc / Vsd, Xc / Xsd
        out.update(retrieval_metrics(Xs @ Vs.T, prefix="S-"))
        return out


def test_retrieval(model, params, items, cfg: Optional[EvalConfig] = None):
    """Functional entry mirroring test_retrieval_yc2 (eval_zeroshot_retrieval.py:157)."""
    return RetrievalEvaluator(model, params, cfg or EvalConfig()).evaluate(items)
