"""Linear-probe action recognition — the end2end path's evaluation protocol.

The reference reports its S3D fine-tune via linear probes on UCF101 / HMDB51 /
K400 (end2end/readme.md:11-13) but ships no probe code.  This module provides
it TPU-natively: embeddings come from the (fine-tuned) S3D tower, and a
multinomial logistic regression trains as one jitted lax.scan loop on device —
no sklearn, no host round trips per step.

Typical use:
    encode = make_s3d_encoder(variables)          # tools/extract_features.py
    train_f = np.concatenate([encode(b) for b in train_clips])
    metrics = linear_probe(train_f, train_y, test_f, test_y, num_classes=101)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def linear_probe(
    train_features: np.ndarray,  # [Nt, D]
    train_labels: np.ndarray,  # [Nt] int
    test_features: np.ndarray,  # [Ne, D]
    test_labels: np.ndarray,  # [Ne] int
    num_classes: int,
    l2: float = 1e-4,
    lr: float = 1e-2,
    steps: int = 500,
    normalize: bool = True,
    seed: int = 0,
) -> Dict[str, float]:
    """Full-batch multinomial logistic regression, jitted end-to-end."""
    Xtr = jnp.asarray(train_features, jnp.float32)
    Xte = jnp.asarray(test_features, jnp.float32)
    ytr = jnp.asarray(train_labels, jnp.int32)
    yte = jnp.asarray(test_labels, jnp.int32)
    if normalize:
        mu = Xtr.mean(0, keepdims=True)
        sd = jnp.maximum(Xtr.std(0, keepdims=True), 1e-6)
        Xtr = (Xtr - mu) / sd
        Xte = (Xte - mu) / sd

    D = Xtr.shape[1]
    rng = jax.random.PRNGKey(seed)
    params = {
        "w": jax.random.normal(rng, (D, num_classes)) * 0.01,
        "b": jnp.zeros(num_classes),
    }
    tx = optax.adam(lr)

    def loss_fn(p):
        logits = Xtr @ p["w"] + p["b"]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ytr).mean()
        return ce + l2 * jnp.sum(p["w"] ** 2)

    @jax.jit
    def fit(params):
        opt_state = tx.init(params)

        def step(carry, _):
            p, s = carry
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                           length=steps)
        logits = Xte @ params["w"] + params["b"]
        order = jnp.argsort(-logits, axis=1)
        top1 = (order[:, 0] == yte).mean()
        top5 = (order[:, : min(5, num_classes)] == yte[:, None]).any(1).mean()
        return top1, top5, losses[-1]

    top1, top5, final_loss = fit(params)
    return {
        "top1": float(top1),
        "top5": float(top5),
        "final_train_loss": float(final_loss),
    }
