"""S3D (MIL-NCE) backbone in Flax — the end2end fine-tune model.

Re-design of the reference torch implementation (model/s3d_milnce/s3dg.py:250-379)
with TPU-native choices:
- channel-LAST layout [B, T, H, W, C] (XLA TPU's native conv layout; the torch
  code is NCTHW);
- the space-to-depth input trick the reference itself flags as "for TPU
  optimization" (s3dg.py:312-318) is a pure reshape/transpose here;
- TF-"SAME" max-pools via lax.reduce_window padding='SAME' instead of the
  manual ConstantPad3d+ceil_mode emulation (s3dg.py:153-183);
- BatchNorm defaults to frozen running stats (use_running_average=True): the
  end2end recipe freezes BN ("essential when finetuning",
  end2end/freeze_bn.py:6-37); set train_bn_stats=True + mutable=['batch_stats']
  to update stats;
- ``freeze_early=True`` stop-gradients stages conv1..mixed_3c, mirroring
  ``freeze_forward`` (s3dg.py:351-378).

Architecture constants (channel widths, kernel shapes) follow the S3D-G paper
configuration as instantiated at s3dg.py:256-305.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Kernel3 = Tuple[int, int, int]


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, T/2, H/2, W/2, 8C]; channel order (t2, h2, w2, C)
    matches the torch permute at s3dg.py:312-318 so pretrained conv1 weights
    convert directly."""
    B, T, H, W, C = x.shape
    x = x.reshape(B, T // 2, 2, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, T // 2, H // 2, W // 2, 8 * C)


class _FoldedS2DConv(nn.Module):
    """conv1 applied to the RAW [B, T, H, W, 3] input, computing exactly
    ``conv(space_to_depth(x))`` without materializing the shuffle.

    The explicit space_to_depth transpose moved the whole clip batch through
    HBM at strided-small-element rates — profiled on v5e (B·n=16 clips,
    16×224², bf16) at 8.1 ms reshape + 6.5 ms copy = ~20% of the 73.7 ms e2e
    step.  A (2,4,4) conv over s2d space IS a (4,8,8) stride-(2,2,2) conv
    over the original pixels: each s2d channel c = ((t2·2+h2)·2+w2)·3+cc maps
    to kernel offset (2kt+t2, 2kh+h2, 2kw+w2, cc), the s2d padding (1,2,2)
    maps to (2,4,4), and the sums contain the same 768 terms.  The stored
    parameter keeps the s2d-space shape [2,4,4,24,out] so checkpoints,
    converters, and the torch key space are untouched; the scatter to
    [4,8,8,3,out] happens at trace time (free).
    """

    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (2, 4, 4, 24, self.output_dim),
            jnp.float32,
        )
        # [kt,kh,kw, (t2,h2,w2,cc), o] -> [2kt+t2, 2kh+h2, 2kw+w2, cc, o]
        w = w.reshape(2, 4, 4, 2, 2, 2, 3, self.output_dim)
        w = w.transpose(0, 3, 1, 4, 2, 5, 6, 7).reshape(
            4, 8, 8, 3, self.output_dim
        )
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(2, 2, 2),
            padding=((2, 2), (4, 4), (4, 4)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


def batch_norm(
    use_running_average: bool, name: str, dtype: jnp.dtype = jnp.float32
) -> nn.BatchNorm:
    """BN over the channel-last axis; eps matches torch BatchNorm3d (1e-5).

    ``dtype`` is the OUTPUT dtype, threaded from the tower's compute dtype.
    Leaving it at flax's default (None) promotes every BN output to f32
    (the f32 scale/bias win the promotion), which silently upcasts the
    whole BN->ReLU->maxpool chain: measured on v5e, the bf16 e2e step then
    spends 22.4% of device time in f32 max-pool-backward select-and-scatter
    (profiles/e2e_step_b16_v5e.md). Stats are still computed in f32
    internally by flax regardless of this dtype."""
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        axis=-1,
        dtype=dtype,
        name=name,
    )


class STConv3D(nn.Module):
    """(Separable) spatio-temporal conv + BN + ReLU (s3dg.py:93-150)."""

    output_dim: int
    kernel_size: Kernel3
    stride: Union[int, Kernel3] = 1
    padding: Union[int, Kernel3, str] = 0
    separable: bool = False
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32
    # conv1-only: consume the RAW input via _FoldedS2DConv (same math and
    # param tree as space_to_depth + this conv; see _FoldedS2DConv)
    fold_s2d: bool = False

    def _pad(self, p) -> Sequence[Tuple[int, int]]:
        if isinstance(p, str):
            return p
        if isinstance(p, int):
            p = (p, p, p)
        return [(int(a), int(a)) for a in p]

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        stride = self.stride if isinstance(self.stride, (tuple, list)) else (self.stride,) * 3
        pad = self.padding

        def conv(x, kernel, stride, padding, name):
            return nn.Conv(
                self.output_dim,
                kernel_size=kernel,
                strides=stride,
                padding=padding,
                use_bias=False,
                # He init: with frozen-identity BN at init, lecun decays the
                # signal ~0.5x per ReLU layer and 25 layers flush it to ~1e-8
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
                name=name,
            )(x)

        bn = lambda name: batch_norm(self.use_running_average, name, self.dtype)
        if self.fold_s2d:
            x = _FoldedS2DConv(self.output_dim, dtype=self.dtype, name="conv1")(x)
            return nn.relu(bn("bn1")(x))
        if self.separable and ks[0] != 1:
            p = (pad, pad, pad) if isinstance(pad, int) else pad
            x = conv(x, (1, ks[1], ks[2]), (1, stride[1], stride[2]),
                     self._pad((0, p[1], p[2])), "conv1")
            x = nn.relu(bn("bn1")(x))
            x = conv(x, (ks[0], 1, 1), (stride[0], 1, 1),
                     self._pad((p[0], 0, 0)), "conv2")
            return nn.relu(bn("bn2")(x))
        x = conv(x, ks, stride, self._pad(pad), "conv1")
        return nn.relu(bn("bn1")(x))


class SelfGating(nn.Module):
    """Squeeze-excite feature gating (s3dg.py:79-90)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=(1, 2, 3))  # over T, H, W
        w = nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype, name="fc")(pooled))
        return w[:, None, None, None, :] * x


def max_pool_same(x, kernel: Kernel3, stride: Kernel3):
    """TF-'SAME' 3D max pool (replaces MaxPool3dTFPadding, s3dg.py:153-183)."""
    return nn.max_pool(
        x, window_shape=kernel, strides=stride, padding="SAME"
    )


class InceptionBlock(nn.Module):
    """4-branch gated inception block (s3dg.py:27-76)."""

    c0: int
    c1a: int
    c1b: int
    c2a: int
    c2b: int
    c3b: int
    gating: bool = True
    use_running_average: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ura = self.use_running_average
        st = lambda out, k, p, sep, name: STConv3D(
            out, k, padding=p, separable=sep,
            use_running_average=ura, dtype=self.dtype, name=name,
        )
        b0 = st(self.c0, (1, 1, 1), 0, False, "conv_b0")(x)
        b1 = st(self.c1a, (1, 1, 1), 0, False, "conv_b1_a")(x)
        b1 = st(self.c1b, (3, 3, 3), 1, True, "conv_b1_b")(b1)
        b2 = st(self.c2a, (1, 1, 1), 0, False, "conv_b2_a")(x)
        b2 = st(self.c2b, (3, 3, 3), 1, True, "conv_b2_b")(b2)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = st(self.c3b, (1, 1, 1), 0, False, "conv_b3_b")(b3)
        if self.gating:
            b0 = SelfGating(dtype=self.dtype, name="gating_b0")(b0)
            b1 = SelfGating(dtype=self.dtype, name="gating_b1")(b1)
            b2 = SelfGating(dtype=self.dtype, name="gating_b2")(b2)
            b3 = SelfGating(dtype=self.dtype, name="gating_b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class S3D(nn.Module):
    """S3D-G video encoder; returns the 1024-d mixed_5c mean-pool
    (s3dg.py:321-348).  Input [B, T, H, W, 3] in [0, 1]."""

    num_classes: int = 512
    gating: bool = True
    use_space_to_depth: bool = True
    use_running_average: bool = True
    freeze_early: bool = False
    dtype: jnp.dtype = jnp.float32
    # fold the s2d shuffle into conv1 (identical sums, ~20% step-time win on
    # v5e — see _FoldedS2DConv); turn off to run the explicit-transpose path
    fold_s2d: bool = True

    @nn.compact
    def __call__(self, x, return_embedding: bool = False):
        ura = self.use_running_average
        dt = self.dtype
        inc = lambda cfg, name: InceptionBlock(
            *cfg, use_running_average=ura, dtype=dt, name=name
        )

        def early(x):
            if self.use_space_to_depth:
                if not self.fold_s2d:
                    x = space_to_depth(x)
                x = STConv3D(
                    64, (2, 4, 4), stride=1, padding=(1, 2, 2),
                    use_running_average=ura, dtype=dt, name="conv1",
                    fold_s2d=self.fold_s2d,
                )(x)
                x = x[:, 1:, 1:, 1:]  # TF-SAME crop (s3dg.py:327-329)
            else:
                x = STConv3D(
                    64, (3, 7, 7), stride=2, padding=(1, 3, 3),
                    use_running_average=ura, dtype=dt, name="conv1",
                )(x)
            x = max_pool_same(x, (1, 3, 3), (1, 2, 2))  # maxpool_2a
            x = STConv3D(64, (1, 1, 1), use_running_average=ura, dtype=dt,
                         name="conv_2b")(x)
            x = STConv3D(192, (3, 3, 3), padding=1, separable=True,
                         use_running_average=ura, dtype=dt, name="conv_2c")(x)
            if self.gating:
                x = SelfGating(dtype=dt, name="gating")(x)
            x = max_pool_same(x, (1, 3, 3), (1, 2, 2))  # maxpool_3a
            x = inc((64, 96, 128, 16, 32, 32), "mixed_3b")(x)
            x = inc((128, 128, 192, 32, 96, 64), "mixed_3c")(x)
            return x

        x = early(x)
        if self.freeze_early:  # freeze_forward (s3dg.py:351-378)
            x = jax.lax.stop_gradient(x)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))  # maxpool_4a
        x = inc((192, 96, 208, 16, 48, 64), "mixed_4b")(x)
        x = inc((160, 112, 224, 24, 64, 64), "mixed_4c")(x)
        x = inc((128, 128, 256, 24, 64, 64), "mixed_4d")(x)
        x = inc((112, 144, 288, 32, 64, 64), "mixed_4e")(x)
        x = inc((256, 160, 320, 32, 128, 128), "mixed_4f")(x)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))  # maxpool_5a
        x = inc((256, 160, 320, 32, 128, 128), "mixed_5b")(x)
        x = inc((384, 192, 384, 48, 128, 128), "mixed_5c")(x)
        emb = jnp.mean(x, axis=(1, 2, 3))  # [B, 1024]
        if return_embedding:
            return emb
        return nn.Dense(self.num_classes, dtype=dt, name="fc")(emb)
