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
from temporalalignnet_tpu.eval.pack import pack_video_table
from temporalalignnet_tpu.models.net import TANWithText


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def plan_clip_windows(start: float, end: float, num_clips: int = 10):
    """Window placement only (no gather): returns
    (chosen_start [K] — may be negative, chosen_vlen, start_idx, end_idx)
    per eval_zeroshot_retrieval.py:105-141: chosen_vlen = clip(2*duration,
    32, 256); windows staggered to cover (or tile) the annotated segment."""
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
    return chosen_start, chosen_vlen, start_idx, end_idx


def sample_clip_windows(
    feature: np.ndarray,  # [vlen, C]
    start: float,
    end: float,
    num_clips: int = 10,
):
    """Host-side gather form of plan_clip_windows (kept for direct use/tests).
    Returns (windows [num_clips, L, C], start_idx, end_idx)."""
    vlen = feature.shape[0]
    chosen_start, chosen_vlen, start_idx, end_idx = plan_clip_windows(
        start, end, num_clips
    )
    idx = chosen_start[:, None] + np.arange(chosen_vlen)[None, :]
    idx = np.clip(idx, 0, vlen - 1)
    return feature[idx], start_idx, end_idx


class RetrievalEvaluator:
    def __init__(self, model: TANWithText, params, cfg: EvalConfig, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — clip batches shard over its
        'data' axis (params and the packed video table replicate), so the
        whole-retrieval-set forward scales across chips and, via
        put_from_host/fetch_global, across hosts as one SPMD computation."""
        self.model = model
        self.params = params
        self.cfg = cfg
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from temporalalignnet_tpu.parallel.mesh import (
                DATA_AXIS,
                replicate_eval_params,
                replicated_sharding,
            )

            self._batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
            self._replicated = replicated_sharding(mesh)
            self.params = replicate_eval_params(params, mesh)
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

        def clip_features_gathered(
            params,
            videos,      # [R, C] unique videos PACKED at true length
            row_off,     # [Q] clip -> first row of its video in the pack
            starts,      # [Q, K] window starts (may be negative)
            vlens,       # [Q] true video lengths
            wpad,        # [Q, K, Lb] True = pad
            seg,         # [Q, K, Lb] True = inside annotated segment
            eff_len,     # [Q] true window length (pos-enc interpolation)
            interpolate: bool,
        ):
            """Batched clip features with ON-DEVICE window gathering: the host
            uploads each video once, PACKED at its true length (no corpus-wide
            max-vlen padding — upload bytes and HBM scale with real content,
            which matters at tunnel/PCIe bandwidth); the 10x window duplication
            happens in HBM.  Boundary clamping replicates sample_clip_windows'
            np.clip (eval_zeroshot_retrieval.py:129-131)."""
            Lb = wpad.shape[-1]
            idx = starts[:, :, None] + jnp.arange(Lb)[None, None, :]  # [Q, K, Lb]
            idx = jnp.clip(idx, 0, vlens[:, None, None] - 1)
            wins = videos[row_off[:, None, None] + idx]  # [Q, K, Lb, C]
            return jax.vmap(clip_feature, in_axes=(None, 0, 0, 0, 0, None))(
                params, wins, wpad, seg, eff_len, interpolate
            )

        self._clip_features_gathered = jax.jit(
            clip_features_gathered, static_argnums=(8,)
        )
        self._text_feature = jax.jit(text_feature)

    def _prepare_item(self, it: Dict):
        cfg = self.cfg
        K = cfg.num_clips
        starts, L, s_idx, e_idx = plan_clip_windows(it["start"], it["end"], K)
        Lb = _round_up(L, 32)
        wpad = np.broadcast_to(np.arange(Lb) >= L, (K, Lb)).copy()
        seg = np.zeros((K, Lb), bool)
        for k in range(K):
            seg[k, s_idx[k] : e_idx[k]] = True
        return starts, L, Lb, wpad, seg, L >= cfg.seq_len  # (:181-184)

    def _put(self, arr, sharding):
        if self._batch_sharding is None:
            return jnp.asarray(arr)
        from temporalalignnet_tpu.parallel.mesh import put_from_host

        return put_from_host(arr, sharding)

    def clip_features(self, items: Sequence[Dict]) -> np.ndarray:
        """Pooled l2-normalized visual features per clip, [Q, C].

        Each unique video ('vid' key, else list position) uploads ONCE, packed
        at true length; the 10x window duplication is an on-device gather.
        Clips group by (window-length bucket, interpolate) into vmapped calls.
        With a mesh, each group's clip axis shards over 'data' (padded to a
        multiple of the axis size by repeating the last clip) and the video
        table replicates — clip windows are independent, so XLA inserts no
        collectives beyond the output all-gather.
        """
        items = list(items)
        preps = [self._prepare_item(it) for it in items]

        # unique-video table, PACKED at true length: upload bytes scale with
        # real content, not len(uniq) * corpus-max-vlen (through the ~33 MB/s
        # axon tunnel the padded table dominated the whole eval)
        vid_keys = [it.get("vid", i) for i, it in enumerate(items)]
        uniq: Dict = {}
        for i, k in enumerate(vid_keys):
            uniq.setdefault(k, np.asarray(items[i]["video"], np.float32))
        videos_np, uoffs = pack_video_table(list(uniq.values()), self.model.dtype)
        off_of = dict(zip(uniq.keys(), (int(o) for o in uoffs)))
        vlen_of = {k: v.shape[0] for k, v in uniq.items()}

        dp = 1
        if self._batch_sharding is not None:
            dp = self._batch_sharding.mesh.shape[self._batch_sharding.spec[0]]
            videos_d = self._put(videos_np, self._replicated)
        else:
            videos_d = jnp.asarray(videos_np)

        groups: Dict[tuple, list] = {}
        for i, (_, _, Lb, _, _, interp) in enumerate(preps):
            groups.setdefault((Lb, interp), []).append(i)

        vis = [None] * len(items)
        for (Lb, interp), idxs in groups.items():
            take = list(idxs) + [idxs[-1]] * ((-len(idxs)) % dp)
            sh = self._batch_sharding
            v = self._clip_features_gathered(
                self.params,
                videos_d,
                self._put(
                    np.asarray([off_of[vid_keys[i]] for i in take], np.int32), sh
                ),
                self._put(
                    np.stack([preps[i][0] for i in take]).astype(np.int32), sh
                ),
                self._put(
                    np.asarray([vlen_of[vid_keys[i]] for i in take], np.int32), sh
                ),
                self._put(np.stack([preps[i][3] for i in take]), sh),
                self._put(np.stack([preps[i][4] for i in take]), sh),
                self._put(
                    np.asarray([preps[i][1] for i in take], np.int32), sh
                ),
                interp,
            )
            from temporalalignnet_tpu.parallel.mesh import fetch_global

            v = fetch_global(v).astype(np.float32)
            for k, i in enumerate(idxs):
                vis[i] = v[k]
        return np.stack(vis)  # [Q, C] f32 for host-side metric math

    def evaluate(self, items: Sequence[Dict]) -> Dict[str, float]:
        """items: {'video': [vlen,C], 'start', 'end', 'input_ids': [W] int}."""
        items = list(items)
        V = self.clip_features(items)

        ids = np.stack([np.asarray(it["input_ids"], np.int32) for it in items])
        # text is tiny — replicate rather than shard it (mesh params need
        # mesh-placed inputs, esp. multi-process where a local device array
        # cannot join a global computation)
        from temporalalignnet_tpu.parallel.mesh import fetch_global

        txt = fetch_global(
            self._text_feature(
                self.params,
                self._put(
                    ids,
                    self._replicated if self._batch_sharding is not None else None,
                ),
            )
        ).astype(np.float32)
        X = txt
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
