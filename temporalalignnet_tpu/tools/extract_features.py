"""Visual feature extraction (reference htm_zoo/visual/extract_feature_template.py).

Decodes whole videos at a model-specific fps and batches frames through a
jitted encoder, writing one {vid}.npy per video — resumable via existing-output
and bad-video drop lists (:329-379).

TPU-first deltas: the encoder is a jitted JAX callable (e.g. the Flax S3D
backbone at 16 frames/feature, or any CLIP-style image tower); frames stream
through a fixed [batch, ...] shape so one compiled program serves every video.

This image has no ffmpeg binary and no network egress for pretrained towers;
the decode step is injectable (``decoder``) exactly like data/clips.py.
"""

from __future__ import annotations

import os
import subprocess
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def ffmpeg_decode_video(path: str, fps: int, size: int) -> np.ndarray:
    """Whole-video decode -> [N, size, size, 3] float32 in [0, 1]
    (extract_feature_template.py:128-232)."""
    cmd = [
        "ffmpeg", "-i", path, "-vf",
        f"fps={fps},scale={size}:{size}",
        "-f", "rawvideo", "-pix_fmt", "rgb24", "-v", "error", "pipe:1",
    ]
    out = subprocess.run(cmd, capture_output=True, timeout=600).stdout
    n_px = size * size * 3
    n = len(out) // n_px
    if n == 0:
        raise RuntimeError(f"no frames decoded from {path}")
    return (
        np.frombuffer(out[: n * n_px], np.uint8)
        .reshape(n, size, size, 3)
        .astype(np.float32)
        / 255.0
    )


class FeatureExtractor:
    """encode_clip: [B, T, H, W, 3] -> [B, C]; one feature per second.

    Backbone coverage note (extract_feature_template.py model branches):
    S3D, CLIP ViT B/32-L/14, and TimeSformer have native towers + converters
    (make_s3d_encoder / make_clip_encoder / make_timesformer_encoder below).
    InternVideo-MM-L-14 (:271-280, :297) is BLOCKED here: its weights and
    model source are unavailable in this environment, so no parity anchor
    can be constructed — a tower written blind would be unverifiable.  The
    extractor treats backbones as injected ``encode_clip`` callables
    precisely so an InternVideo tower drops in with no extractor change
    once weights exist (the TimeSformer tower already covers the
    divided-space-time video-transformer architecture family, and the
    fps-8 / 8-frame-clip layout it needs is the same, :266-280)."""

    def __init__(
        self,
        encode_clip: Callable[[np.ndarray], np.ndarray],
        fps: int = 16,
        frames_per_feature: int = 16,
        size: int = 224,
        batch_size: int = 8,
        decoder: Optional[Callable[[str, int, int], np.ndarray]] = None,
    ):
        self.encode_clip = encode_clip
        self.fps = fps
        self.frames_per_feature = frames_per_feature
        self.size = size
        self.batch_size = batch_size
        self.decoder = decoder or ffmpeg_decode_video

    def extract_video(self, path: str) -> np.ndarray:
        frames = self.decoder(path, self.fps, self.size)
        T = self.frames_per_feature
        n_feat = len(frames) // T
        if n_feat == 0:  # pad a too-short video to one clip
            pad = np.repeat(frames[-1:], T - len(frames), axis=0)
            frames = np.concatenate([frames, pad], 0)
            n_feat = 1
        clips = frames[: n_feat * T].reshape(n_feat, T, self.size, self.size, 3)
        feats = []
        B = self.batch_size
        for i in range(0, n_feat, B):
            chunk = clips[i : i + B]
            if len(chunk) < B:  # fixed shape for the jitted encoder
                pad = np.repeat(chunk[-1:], B - len(chunk), axis=0)
                batch = np.concatenate([chunk, pad], 0)
                feats.append(np.asarray(self.encode_clip(batch))[: len(chunk)])
            else:
                feats.append(np.asarray(self.encode_clip(chunk)))
        return np.concatenate(feats, 0)

    def run(
        self,
        videos: Dict[str, str],  # vid -> path
        out_dir: str,
        bad_vids: Sequence[str] = (),
    ) -> List[str]:
        """Resumable batch extraction: skips existing outputs and drop-listed
        videos (extract_feature_template.py:329-379)."""
        os.makedirs(out_dir, exist_ok=True)
        done = []
        bad = set(bad_vids)
        for vid, path in sorted(videos.items()):
            out_path = os.path.join(out_dir, f"{vid}.npy")
            if vid in bad or os.path.exists(out_path):
                continue
            try:
                feats = self.extract_video(path)
            except Exception as e:
                print(f"[extract] {vid} failed: {e}")
                continue
            np.save(out_path, feats.astype(np.float16))
            done.append(out_path)
        return done


def make_s3d_encoder(variables, dtype=None) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted Flax-S3D clip encoder producing 1024-d mixed_5c features."""
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.models.s3d import S3D

    model = S3D(use_running_average=True, dtype=dtype or jnp.float32)

    @jax.jit
    def encode(clips):
        return model.apply(variables, clips, return_embedding=True)

    return lambda x: encode(jnp.asarray(x))


def make_clip_encoder(params, dtype=None, normalize=True,
                      **tower_kwargs) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted CLIP-ViT clip encoder: [B, T, H, W, 3] uint8 frames -> [B, E].

    The reference extractor runs CLIP at fps 1 with per-frame features
    (htm_zoo/visual/extract_feature_template.py:236-307); frames within the
    1-second window are mean-pooled (T is 1 there).  ``params`` comes from
    checkpoint/clip_convert.py::clip_vision_torch_to_params; ``tower_kwargs``
    select the variant (defaults: ViT-B/32; see models/clip_vit.py for L/14).
    """
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.models.clip_vit import (
        CLIPImageEncoder,
        preprocess_frames,
    )

    model = CLIPImageEncoder(dtype=dtype or jnp.float32, **tower_kwargs)

    @jax.jit
    def encode(frames):
        B, T = frames.shape[:2]
        x = preprocess_frames(frames.reshape((B * T,) + frames.shape[2:]))
        feats = model.apply({"params": params}, x)
        feats = feats.reshape(B, T, -1).mean(axis=1)
        if normalize:  # CLIP similarity is cosine (eval --baseline_sim cos)
            feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
        return feats

    return lambda x: encode(jnp.asarray(x))


def make_timesformer_encoder(params, dtype=None,
                             **tower_kwargs) -> Callable[[np.ndarray], np.ndarray]:
    """Jitted TimeSformer clip encoder: [B, T, H, W, 3] uint8 -> [B, width].

    The reference extractor runs its video-transformer backbones at fps 8,
    regrouping the frame stream into 8-frame clips and saving one backbone
    feature per clip (extract_feature_template.py:266-269 timesformer,
    :271-280 internvideo — same clip layout).  T here is that clip length
    (== the tower's ``frames``).  ``params`` comes from
    checkpoint/timesformer_convert.py::timesformer_torch_to_params.
    """
    import jax
    import jax.numpy as jnp

    from temporalalignnet_tpu.models.timesformer import (
        TimeSformerEncoder,
        preprocess_clip,
    )

    model = TimeSformerEncoder(dtype=dtype or jnp.float32, **tower_kwargs)

    @jax.jit
    def encode(clips):
        return model.apply({"params": params}, preprocess_clip(clips))

    return lambda x: encode(jnp.asarray(x))
