"""Checkpoint subsystem tests.

- torch -> flax converter: key mapping, QKV split, full-forward activation parity
  against a faithful torch replica of the reference model (reference
  model/tan_model.py:100-149, model/tfm_model.py:17-55) — the parity anchor for
  loading the released .pth.tar.
- round-trip params -> torch -> params.
- twin (online/target) split and Stage-1 -> Stage-2 duplication.
- orbax save/restore round trip and resume semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from temporalalignnet_tpu.checkpoint import (
    Checkpointer,
    diff_param_trees,
    params_to_torch,
    split_twin_state_dict,
    stage1_to_stage2,
    torch_to_params,
)
from temporalalignnet_tpu.core.config import LossConfig, ModelConfig, TrainConfig
from temporalalignnet_tpu.models.net import TANWithText

from torch_replica import TorchTAN

WIDTH, HEADS, LAYERS = 64, 4, 2
VDIM, VOCAB = 48, 50
T, N, W, B = 8, 3, 6, 2


def make_pair(seed=0):
    torch.manual_seed(seed)
    tmodel = TorchTAN(
        width=WIDTH, heads=HEADS, enc_layers=LAYERS, joint_layers=LAYERS,
        vdim=VDIM, vocab_words=VOCAB, num_pos=128,
    ).eval()
    cfg = ModelConfig(
        width=WIDTH,
        heads=HEADS,
        num_encoder_layers=LAYERS,
        num_joint_layers=LAYERS,
        video_embed_dim=VDIM,
        num_pos_embeds=128,
        use_alignability_head=True,
        random_pos_start=False,
    )
    fmodel = TANWithText(cfg, vocab_size=VOCAB + 1)
    report = []
    params = torch_to_params(tmodel.state_dict(), report)
    return tmodel, fmodel, params, report


class TestConverter:
    def test_structure_matches_flax_init(self, rng):
        tmodel, fmodel, params, report = make_pair()
        video = jnp.asarray(rng.randn(B, T, VDIM), jnp.float32)
        ids = jnp.asarray(rng.randint(1, VOCAB, (B, N, W)), jnp.int32)
        ref = fmodel.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            video,
            ids,
            deterministic=True,
        )["params"]
        assert diff_param_trees(ref, params) == []
        assert report == ["dropped (unused in reference forward): mlp.bias",
                          "dropped (unused in reference forward): mlp.weight"] or all(
            "mlp." in r for r in report
        )

    def test_full_forward_parity(self, rng):
        """Converted weights reproduce the torch forward to ~1e-5 — validates the
        QKV split, every transpose, and the flax attention/tap semantics."""
        tmodel, fmodel, params, _ = make_pair()
        video = rng.randn(B, T, VDIM).astype(np.float32)
        ids = rng.randint(1, VOCAB, (B, N, W))
        ids[0, -1] = 0  # a fully padded sentence
        ids[1, 0, W // 2 :] = 0  # partially padded tokens
        tok_mask = (ids != 0).astype(np.int64)
        lang_pad = ~tok_mask.any(-1)

        with torch.no_grad():
            t_dual, t_joint, t_head = tmodel(
                torch.from_numpy(video),
                torch.from_numpy(ids),
                torch.from_numpy(tok_mask),
                torch.from_numpy(lang_pad),
            )

        out = fmodel.apply(
            {"params": params},
            jnp.asarray(video),
            jnp.asarray(ids, jnp.int32),
            lang_padding_mask=jnp.asarray(lang_pad),
            deterministic=True,
        )
        np.testing.assert_allclose(
            np.asarray(out["logits_dual"]), t_dual.numpy(), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["logits_joint"]), t_joint.numpy(), atol=2e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["joint_logits_alignability"]), t_head.numpy(), atol=2e-5, rtol=1e-4
        )

    def test_round_trip(self):
        tmodel, _, params, _ = make_pair()
        back = params_to_torch(params)
        sd = {k: v for k, v in tmodel.state_dict().items() if not k.startswith("mlp.")}
        assert set(back) == set(sd)
        for k in sd:
            np.testing.assert_allclose(back[k], sd[k].numpy(), atol=1e-7, err_msg=k)

    def test_twin_split_and_stage1_to_stage2(self):
        tmodel, _, _, _ = make_pair()
        sd = tmodel.state_dict()
        twin = {f"online.{k}": v for k, v in sd.items()}
        twin.update({f"target.{k}": v.clone() for k, v in sd.items()})
        online, target = split_twin_state_dict(twin)
        assert set(online) == set(sd) and set(target) == set(sd)

        plain, none_target = split_twin_state_dict(sd)
        assert none_target is None and set(plain) == set(sd)

        params = torch_to_params(online)
        online_p, ema_p = stage1_to_stage2(params)
        a = jax.tree_util.tree_leaves(online_p)[0]
        b = jax.tree_util.tree_leaves(ema_p)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a is not b


class TestOrbax:
    def _tiny_state(self, seed=0):
        from temporalalignnet_tpu.data.synthetic import synthetic_batch
        from temporalalignnet_tpu.train.train_step import create_train_state

        rng = np.random.RandomState(seed)
        batch = synthetic_batch(
            rng, batch_size=2, seq_len=16, max_sentences=2, feature_dim=VDIM,
            vocab_size=VOCAB, max_words=4,
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        cfg = ModelConfig(
            width=32, heads=2, num_encoder_layers=1, num_joint_layers=1,
            video_embed_dim=VDIM, num_pos_embeds=32,
        )
        model = TANWithText(cfg, vocab_size=VOCAB + 1)
        state, tx = create_train_state(
            model, TrainConfig(), LossConfig(), batch, seed=seed
        )
        return state

    def test_save_restore_round_trip(self, tmp_path):
        state = self._tiny_state()
        ck = Checkpointer(str(tmp_path / "exp"))
        ck.save_runtime(state, step=7)
        ck.wait()
        assert ck.latest_step() == 7
        restored = ck.restore(jax.tree_util.tree_map(np.zeros_like, state))
        for a, b in zip(
            jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ck.close()

    def test_epoch_rotation_keeps_best(self, tmp_path):
        state = self._tiny_state()
        ck = Checkpointer(str(tmp_path / "exp"), max_best=2, best_metric="Recall")
        for epoch, recall in enumerate([0.1, 0.5, 0.3, 0.2]):
            ck.save_epoch(state, epoch, {"Recall": recall})
        ck.wait()
        assert ck.best_epoch() == 1
        kept = set(ck._epoch.all_steps())
        assert 1 in kept and len(kept) <= 2
        ck.close()

    def test_one_shot_params_export(self, tmp_path):
        """save_params must block until durable — an async-incomplete step
        directory hangs the next reader (found by driving the converter flow)."""
        from temporalalignnet_tpu.checkpoint import load_params, save_params

        _, _, params, _ = make_pair()
        path = str(tmp_path / "exported")
        save_params(path, params)
        back = load_params(path)
        assert diff_param_trees(params, back) == []

    def test_runtime_keeps_only_latest(self, tmp_path):
        state = self._tiny_state()
        ck = Checkpointer(str(tmp_path / "exp"))
        ck.save_runtime(state, 1)
        ck.save_runtime(state, 2)
        ck.wait()
        assert ck._runtime.all_steps() == [2]
        ck.close()
