"""Checkpoint subsystem tests.

- torch -> flax converter: key mapping, QKV split, full-forward activation parity
  against a faithful torch replica of the reference model (reference
  model/tan_model.py:100-149, model/tfm_model.py:17-55) — the parity anchor for
  loading the released .pth.tar.
- round-trip params -> torch -> params.
- twin (online/target) split and Stage-1 -> Stage-2 duplication.
- orbax save/restore round trip and resume semantics.
"""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

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

WIDTH, HEADS, LAYERS = 64, 4, 2
VDIM, VOCAB = 48, 50
T, N, W, B = 8, 3, 6, 2


# ----------------------------------------------------------------------------
# Torch replica of the reference model (same key space as model/tan_model.py).
# Written from the SURVEY description, not copied; it exists to prove the
# converter + flax forward reproduce torch nn.MultiheadAttention semantics.
# ----------------------------------------------------------------------------


class _TorchBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn = nn.MultiheadAttention(WIDTH, HEADS, batch_first=True)
        self.ln_1 = nn.LayerNorm(WIDTH)
        self.mlp = nn.Sequential(
            collections.OrderedDict(
                [
                    ("c_fc", nn.Linear(WIDTH, WIDTH * 4)),
                    ("gelu", nn.Identity()),  # replaced by QuickGELU in forward
                    ("c_proj", nn.Linear(WIDTH * 4, WIDTH)),
                ]
            )
        )
        self.ln_2 = nn.LayerNorm(WIDTH)

    def forward(self, x, key_padding_mask=None):
        x_norm = self.ln_1(x)
        a, _ = self.attn(
            x_norm, x_norm, x_norm, key_padding_mask=key_padding_mask, need_weights=False
        )
        x = x + a
        h = self.mlp.c_fc(self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.mlp.c_proj(h), x_norm


class _TorchEncoder(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.resblocks = nn.ModuleList(_TorchBlock() for _ in range(layers))

    def forward(self, x, key_padding_mask=None):
        taps = []
        for blk in self.resblocks:
            x, x_norm = blk(x, key_padding_mask)
            taps.append(x_norm)
        taps.pop(0)
        taps.append(x)
        return taps


class _TorchWord2Vec(nn.Module):
    def __init__(self):
        super().__init__()
        self.word_embd = nn.Embedding(VOCAB + 1, 300)
        self.fc1 = nn.Linear(300, 2048)
        self.fc2 = nn.Linear(2048, 512)  # word2vec output is 512-d regardless of width

    def forward(self, ids, mask):
        x = torch.relu(self.fc1(self.word_embd(ids)))
        keep = mask.bool()
        keep = keep | ~keep.any(-1, keepdim=True)
        x = x.masked_fill(~keep.unsqueeze(-1), -6.0e4)
        return self.fc2(x.max(dim=-2).values)


class _TorchTAN(nn.Module):
    """Key space identical to reference TemporalAligner (tan_model.py:38-72)."""

    def __init__(self):
        super().__init__()
        self.bert = _TorchWord2Vec()
        self.video_temporal_encoder = _TorchEncoder(LAYERS)
        self.joint_temporal_encoder = _TorchEncoder(LAYERS)
        self.video_pre_proj = nn.Linear(VDIM, WIDTH, bias=False)
        self.text_pre_proj = nn.Linear(512, WIDTH, bias=False)
        self.ln_text_init = nn.LayerNorm(WIDTH)
        self.ln_video_init = nn.LayerNorm(WIDTH)
        self.ln_position_init = nn.LayerNorm(WIDTH)
        self.ln_video_post_enc = nn.LayerNorm(WIDTH)
        self.ln_joint_post_enc = nn.LayerNorm(WIDTH)
        self.temporal_pos_embed = nn.Parameter(torch.randn(128, WIDTH) * 0.01)
        self.text_temporal_pos_embed = nn.Parameter(torch.randn(128, WIDTH) * 0.01)
        self.mlp = nn.Linear(WIDTH, WIDTH)  # unused, as in the reference
        self.binary_head = nn.Linear(WIDTH, 1)

    def forward(self, video, ids, tok_mask, lang_padding_mask):
        nrm = lambda x: x / x.norm(dim=-1, keepdim=True)
        text = self.ln_text_init(self.text_pre_proj(self.bert(ids, tok_mask)))

        v = self.ln_video_init(self.video_pre_proj(video))
        v = v + self.ln_position_init(self.temporal_pos_embed[: v.shape[1]])
        dual = torch.stack(self.video_temporal_encoder(v), dim=1)  # [B,S,T,C]
        dual = torch.cat(
            [dual[:, :-1], self.ln_video_post_enc(dual[:, -1:])], dim=1
        )
        logits_dual = torch.einsum("astc,bkc->astbk", nrm(dual), nrm(text))

        joint_in = torch.cat([v, text], dim=1)
        pad = torch.cat(
            [torch.zeros(video.shape[0], v.shape[1], dtype=torch.bool), lang_padding_mask],
            dim=1,
        )
        joint = torch.stack(self.joint_temporal_encoder(joint_in, pad), dim=1)
        joint = torch.cat(
            [joint[:, :-1], self.ln_joint_post_enc(joint[:, -1:])], dim=1
        )
        jv, jt = joint[:, :, : v.shape[1]], joint[:, :, v.shape[1] :]
        logits_joint = torch.einsum("astc,bskc->astbk", nrm(jv), nrm(jt))
        return logits_dual, logits_joint, self.binary_head(jt)


def make_pair(seed=0):
    torch.manual_seed(seed)
    tmodel = _TorchTAN().eval()
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
