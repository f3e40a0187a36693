"""Pallas fused attention: kernel-vs-jnp parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.ops.attention import _attention_xla, multihead_attention
from temporalalignnet_tpu.ops.pallas_attention import fused_attention


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("shape", [(3, 4, 64, 32), (2, 8, 96, 64)])
def test_kernel_matches_xla(rng, masked, shape):
    B, H, S, D = shape
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    mask = None
    if masked:
        mask = jnp.asarray(rng.rand(B, S) < 0.3)
        mask = mask.at[:, 0].set(False)  # keep >= 1 valid key per row
    ref = _attention_xla(q, k, v, mask)
    out = fused_attention(q, k, v, mask)
    # padded queries still get defined (garbage-but-equal) values — compare all.
    # On real TPU, f32 matmuls run as multi-pass bf16 with different accumulation
    # order between the XLA and Mosaic lowerings: ~0.1% of elements differ by up
    # to ~4e-4 at S=96.  Interpret mode (CPU CI) stays at 2e-5.
    atol = 2e-5 if jax.default_backend() != "tpu" else 1e-3
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol, rtol=1e-3)


def test_bf16_path(rng):
    B, H, S, D = 2, 4, 64, 64
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    out = fused_attention(q, k, v, None)
    ref = _attention_xla(q, k, v, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_dispatch_through_multihead_attention(rng):
    """use_pallas=True routes through the kernel and matches the XLA path."""
    B, H, S, D = 2, 4, 32, 32
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    mask = jnp.zeros((B, S), bool).at[:, -5:].set(True)
    a = multihead_attention(q, k, v, mask, use_pallas=False)
    b = multihead_attention(q, k, v, mask, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_grad_matches_xla(rng, masked):
    """Custom-VJP backward kernel: grads through fused_attention equal the
    XLA-path autodiff grads (VERDICT r1 item 8 — use_pallas legal in training)."""
    B, H, S, D = 2, 4, 64, 32
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    w = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)  # non-uniform cotangent
    mask = None
    if masked:
        mask = jnp.asarray(rng.rand(B, S) < 0.3)
        mask = mask.at[:, 0].set(False)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, mask) * w)

    gx = jax.grad(lambda *a: loss(_attention_xla, *a), argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(lambda *a: loss(fused_attention, *a), argnums=(0, 1, 2))(q, k, v)
    atol = 3e-5 if jax.default_backend() != "tpu" else 2e-3
    for a, b, name in zip(gx, gp, "qkv"):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=atol, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_train_step_with_pallas(rng):
    """A full TAN grad step with use_pallas=True produces grads matching the
    XLA path — the kernel is usable for training, not just eval."""
    from temporalalignnet_tpu.core.config import ModelConfig
    from temporalalignnet_tpu.models.net import TANWithText

    cfg = ModelConfig(
        width=64, heads=4, num_encoder_layers=2, num_joint_layers=2,
        video_embed_dim=32, num_pos_embeds=64, random_pos_start=False,
    )
    video = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    ids = jnp.asarray(rng.randint(1, 50, (2, 3, 6)), jnp.int32)
    m_x = TANWithText(cfg, vocab_size=51, use_pallas=False)
    m_p = TANWithText(cfg, vocab_size=51, use_pallas=True)
    params = m_x.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        video, ids, deterministic=True,
    )["params"]

    def loss(model, params):
        out = model.apply({"params": params}, video, ids, deterministic=True)
        return jnp.mean(out["logits_joint"] ** 2) + jnp.mean(out["logits_dual"] ** 2)

    gx = jax.grad(lambda p: loss(m_x, p))(params)
    gp = jax.grad(lambda p: loss(m_p, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_model_forward_with_pallas(rng):
    """Full TAN eval forward with use_pallas=True equals the XLA-path forward."""
    from temporalalignnet_tpu.core.config import ModelConfig
    from temporalalignnet_tpu.models.net import TANWithText

    cfg = ModelConfig(
        width=64, heads=4, num_encoder_layers=2, num_joint_layers=2,
        video_embed_dim=32, num_pos_embeds=64, random_pos_start=False,
    )
    video = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    ids = jnp.asarray(rng.randint(1, 50, (2, 3, 6)), jnp.int32)

    m_x = TANWithText(cfg, vocab_size=51, use_pallas=False)
    m_p = TANWithText(cfg, vocab_size=51, use_pallas=True)
    params = m_x.init(
        {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
        video, ids, deterministic=True,
    )["params"]
    out_x = m_x.apply({"params": params}, video, ids, deterministic=True)
    out_p = m_p.apply({"params": params}, video, ids, deterministic=True)
    for key in ("logits_dual", "logits_joint"):
        np.testing.assert_allclose(
            np.asarray(out_x[key]), np.asarray(out_p[key]), atol=3e-5, rtol=1e-4
        )
