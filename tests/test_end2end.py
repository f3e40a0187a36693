"""End2end path tests: Flax S3D vs torch replica, InfoNCE step, clip dataset."""

import csv as csv_mod
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from temporalalignnet_tpu.checkpoint import s3d_torch_to_variables
from temporalalignnet_tpu.core.config import TrainConfig
from temporalalignnet_tpu.models.s3d import S3D, space_to_depth
from temporalalignnet_tpu.train.end2end import (
    S3DWithText,
    E2ETrainState,
    make_e2e_optimizer,
    make_e2e_train_step,
    nce_loss,
)

# ----------------------------------------------------------------------------
# Torch replica of the MIL-NCE S3D (same key space as model/s3d_milnce/s3dg.py),
# written from the architecture table in SURVEY §2.1 to validate the converter.
# ----------------------------------------------------------------------------


class TSTConv3D(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, separable=False):
        super().__init__()
        self.separable = separable and k[0] != 1
        if self.separable:
            sk, tk = [1, k[1], k[2]], [k[0], 1, 1]
            if isinstance(padding, (list, tuple)):
                sp, tp = [0, padding[1], padding[2]], [padding[0], 0, 0]
            else:
                sp, tp = [0, padding, padding], [padding, 0, 0]
            self.conv1 = nn.Conv3d(cin, cout, sk, stride=[1, stride, stride] if not isinstance(stride, list) else [1, stride[1], stride[2]], padding=sp, bias=False)
            self.bn1 = nn.BatchNorm3d(cout)
            self.conv2 = nn.Conv3d(cout, cout, tk, stride=[stride, 1, 1] if not isinstance(stride, list) else [stride[0], 1, 1], padding=tp, bias=False)
            self.bn2 = nn.BatchNorm3d(cout)
        else:
            self.conv1 = nn.Conv3d(cin, cout, list(k), stride=stride, padding=padding, bias=False)
            self.bn1 = nn.BatchNorm3d(cout)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        if self.separable:
            x = F.relu(self.bn2(self.conv2(x)))
        return x


class TSelfGating(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc = nn.Linear(dim, dim)

    def forward(self, x):
        w = torch.sigmoid(self.fc(x.mean(dim=[2, 3, 4])))
        return w[:, :, None, None, None] * x


def tf_same_pool(x, k, s):
    pads = []
    for kd, sd in zip(k, s):
        along = max(kd - sd, 0)
        pads.append((along // 2, along - along // 2))
    # F.pad takes (Wl, Wr, Hl, Hr, Tl, Tr)
    x = F.pad(x, (pads[2][0], pads[2][1], pads[1][0], pads[1][1], pads[0][0], pads[0][1]))
    return F.max_pool3d(x, k, s, ceil_mode=True)


class TInception(nn.Module):
    def __init__(self, cin, c0, c1a, c1b, c2a, c2b, c3b):
        super().__init__()
        self.conv_b0 = TSTConv3D(cin, c0, [1, 1, 1])
        self.conv_b1_a = TSTConv3D(cin, c1a, [1, 1, 1])
        self.conv_b1_b = TSTConv3D(c1a, c1b, [3, 3, 3], padding=1, separable=True)
        self.conv_b2_a = TSTConv3D(cin, c2a, [1, 1, 1])
        self.conv_b2_b = TSTConv3D(c2a, c2b, [3, 3, 3], padding=1, separable=True)
        self.conv_b3_b = TSTConv3D(cin, c3b, [1, 1, 1])
        self.gating_b0 = TSelfGating(c0)
        self.gating_b1 = TSelfGating(c1b)
        self.gating_b2 = TSelfGating(c2b)
        self.gating_b3 = TSelfGating(c3b)
        self.output_dim = c0 + c1b + c2b + c3b

    def forward(self, x):
        b0 = self.gating_b0(self.conv_b0(x))
        b1 = self.gating_b1(self.conv_b1_b(self.conv_b1_a(x)))
        b2 = self.gating_b2(self.conv_b2_b(self.conv_b2_a(x)))
        b3 = self.gating_b3(self.conv_b3_b(F.max_pool3d(F.pad(x, (1, 1, 1, 1, 1, 1)), 3, 1)))
        return torch.cat([b0, b1, b2, b3], dim=1)


class TS3D(nn.Module):
    def __init__(self, num_classes=512):
        super().__init__()
        self.conv1 = TSTConv3D(24, 64, [2, 4, 4], stride=1, padding=(1, 2, 2))
        self.conv_2b = TSTConv3D(64, 64, [1, 1, 1])
        self.conv_2c = TSTConv3D(64, 192, [3, 3, 3], padding=1, separable=True)
        self.gating = TSelfGating(192)
        self.mixed_3b = TInception(192, 64, 96, 128, 16, 32, 32)
        self.mixed_3c = TInception(self.mixed_3b.output_dim, 128, 128, 192, 32, 96, 64)
        self.mixed_4b = TInception(self.mixed_3c.output_dim, 192, 96, 208, 16, 48, 64)
        self.mixed_4c = TInception(self.mixed_4b.output_dim, 160, 112, 224, 24, 64, 64)
        self.mixed_4d = TInception(self.mixed_4c.output_dim, 128, 128, 256, 24, 64, 64)
        self.mixed_4e = TInception(self.mixed_4d.output_dim, 112, 144, 288, 32, 64, 64)
        self.mixed_4f = TInception(self.mixed_4e.output_dim, 256, 160, 320, 32, 128, 128)
        self.mixed_5b = TInception(self.mixed_4f.output_dim, 256, 160, 320, 32, 128, 128)
        self.mixed_5c = TInception(self.mixed_5b.output_dim, 384, 192, 384, 48, 128, 128)
        self.fc = nn.Linear(self.mixed_5c.output_dim, num_classes)

    def _s2d(self, x):
        B, C, T, H, W = x.shape
        x = x.view(B, C, T // 2, 2, H // 2, 2, W // 2, 2)
        x = x.permute(0, 3, 5, 7, 1, 2, 4, 6)
        return x.contiguous().view(B, 8 * C, T // 2, H // 2, W // 2)

    def forward(self, x):
        x = self.conv1(self._s2d(x))[:, :, 1:, 1:, 1:]
        x = tf_same_pool(x, (1, 3, 3), (1, 2, 2))
        x = self.conv_2c(self.conv_2b(x))
        x = self.gating(x)
        x = tf_same_pool(x, (1, 3, 3), (1, 2, 2))
        x = self.mixed_3c(self.mixed_3b(x))
        x = tf_same_pool(x, (3, 3, 3), (2, 2, 2))
        x = self.mixed_4f(self.mixed_4e(self.mixed_4d(self.mixed_4c(self.mixed_4b(x)))))
        x = tf_same_pool(x, (2, 2, 2), (2, 2, 2))
        x = self.mixed_5c(self.mixed_5b(x))
        emb = x.mean(dim=[2, 3, 4])
        return emb, self.fc(emb)


class TestS3DParity:
    def test_space_to_depth_matches_torch(self, rng):
        x = rng.randn(2, 8, 16, 16, 3).astype(np.float32)
        ours = space_to_depth(jnp.asarray(x))
        xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        theirs = TS3D()._s2d(xt).numpy().transpose(0, 2, 3, 4, 1)
        np.testing.assert_array_equal(np.asarray(ours), theirs)

    def test_full_forward_parity(self, rng):
        """Converted random torch weights reproduce the torch forward —
        validates every conv transpose, BN stat, pool padding, and the crop."""
        torch.manual_seed(0)
        tmodel = TS3D().eval()
        # randomize BN running stats so the test catches stat mix-ups
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

        converted = s3d_torch_to_variables(tmodel.state_dict())
        model = S3D(num_classes=512)
        x = rng.rand(1, 8, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            t_emb, t_logits = tmodel(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
        variables = {
            "params": converted["params"],
            "batch_stats": converted["batch_stats"],
        }
        f_emb = model.apply(variables, jnp.asarray(x), return_embedding=True)
        f_logits = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(f_emb), t_emb.numpy(), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(f_logits), t_logits.numpy(), atol=2e-4, rtol=1e-3
        )

    def test_fold_s2d_matches_explicit_path(self, rng):
        """The folded conv1 (stride-2 conv on RAW pixels with the scattered
        kernel, models/s3d.py::_FoldedS2DConv) computes the same function as
        explicit space_to_depth + conv1, on the SAME param tree — and both
        gradients agree (it is the default path, so the equivalence is
        what keeps every torch-parity bound above valid)."""
        folded = S3D(num_classes=8, fold_s2d=True)
        explicit = S3D(num_classes=8, fold_s2d=False)
        x = jnp.asarray(rng.rand(2, 4, 32, 32, 3), jnp.float32)
        v = folded.init(jax.random.PRNGKey(2), x)
        from temporalalignnet_tpu.checkpoint import diff_param_trees

        v_e = explicit.init(jax.random.PRNGKey(2), x)
        assert diff_param_trees(v_e["params"], v["params"]) == []

        out_f = folded.apply(v, x, return_embedding=True)
        out_e = explicit.apply(v, x, return_embedding=True)
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_e), atol=1e-5, rtol=1e-5
        )

        def loss(variables, model):
            return jnp.sum(model.apply(variables, x, return_embedding=True) ** 2)

        g_f = jax.grad(lambda p: loss({**v, "params": p}, folded))(v["params"])
        g_e = jax.grad(lambda p: loss({**v, "params": p}, explicit))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_e)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_structure_matches_init(self, rng):
        torch.manual_seed(1)
        tmodel = TS3D()
        converted = s3d_torch_to_variables(tmodel.state_dict())
        model = S3D(num_classes=512)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))
        from temporalalignnet_tpu.checkpoint import diff_param_trees

        assert diff_param_trees(ref["params"], converted["params"]) == []
        assert diff_param_trees(ref["batch_stats"], converted["batch_stats"]) == []


class TestE2ETraining:
    def test_nce_loss_perfect_alignment(self):
        emb = np.eye(4, 8, dtype=np.float32) * 10
        loss, m = nce_loss(jnp.asarray(emb), jnp.asarray(emb))
        assert float(m["top1/v2t"]) == 1.0 and float(m["top1/t2v"]) == 1.0
        assert float(loss) < 0.01

    def test_train_step_runs_and_learns(self, rng):
        model = S3DWithText(num_classes=32, vocab_size=50)
        B, n, T, S, W = 2, 2, 4, 32, 6
        # distinct mean colors per clip: uniform noise alone pools to nearly
        # identical embeddings and InfoNCE has no signal to fit
        colors = rng.rand(B, n, 1, 1, 1, 3)
        clips = jnp.asarray(
            0.5 * colors + 0.1 * rng.rand(B, n, T, S, S, 3), jnp.float32
        )
        ids = jnp.asarray(rng.randint(1, 50, (B, n, W)), jnp.int32)
        variables = model.init(
            jax.random.PRNGKey(0), clips.reshape(B * n, T, S, S, 3),
            ids.reshape(B * n, W),
        )
        cfg = TrainConfig(lr=5e-3, warmup_iterations=0, total_iterations=200)
        tx = make_e2e_optimizer(cfg, variables["params"])
        state = E2ETrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        step = make_e2e_train_step(model, tx)
        batch = {"clips": clips, "input_ids": ids}
        losses = []
        stats_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
        for _ in range(6):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
            assert float(metrics["grad_norm"]) > 0
        assert np.isfinite(losses).all()
        # step 0's loss is computed at init (~ln B); optimization progress shows
        # from the post-first-update loss onward — require a real decrease there
        assert losses[-1] < losses[1] - 0.1, losses
        # frozen BN: running stats never move (freeze_bn.py:6-37)
        stats_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
        np.testing.assert_array_equal(np.asarray(stats_before), np.asarray(stats_after))

    def test_train_bn_stats_update(self, rng):
        """train_bn_stats=True runs BN in train mode: the step threads
        mutable=['batch_stats'] and the running stats actually move
        (the reference's un-frozen path, s3dg.py BN train mode; freeze_bn.py
        is the surgery that our default emulates)."""
        model = S3DWithText(num_classes=16, vocab_size=50, train_bn_stats=True)
        B, n, T, S, W = 2, 1, 4, 32, 6
        clips = jnp.asarray(rng.rand(B, n, T, S, S, 3), jnp.float32)
        ids = jnp.asarray(rng.randint(1, 50, (B, n, W)), jnp.int32)
        variables = model.init(
            jax.random.PRNGKey(0), clips.reshape(B * n, T, S, S, 3),
            ids.reshape(B * n, W),
        )
        cfg = TrainConfig(lr=1e-3, warmup_iterations=0, total_iterations=50)
        tx = make_e2e_optimizer(cfg, variables["params"])
        state = E2ETrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]),
        )
        step = make_e2e_train_step(model, tx)
        stats_before = jax.device_get(state.batch_stats)
        state, metrics = step(state, {"clips": clips, "input_ids": ids})
        assert np.isfinite(float(metrics["loss"]))
        stats_after = jax.device_get(state.batch_stats)
        moved = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(stats_before),
                jax.tree_util.tree_leaves(stats_after),
            )
        ]
        # every BN layer sees non-degenerate activations -> all stats move
        assert all(moved), f"{sum(moved)}/{len(moved)} stats leaves moved"
        # a second step keeps compounding (momentum EMA, torch BatchNorm3d 0.1)
        state, _ = step(state, {"clips": clips, "input_ids": ids})
        stats_third = jax.device_get(state.batch_stats)
        assert not np.allclose(
            jax.tree_util.tree_leaves(stats_after)[0],
            jax.tree_util.tree_leaves(stats_third)[0],
        )


class TestClipDataset:
    def _write_csv(self, path, rows):
        with open(path, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=["vid", "text", "timestamp"])
            w.writeheader()
            for r in rows:
                w.writerow(r)

    def test_sampling_and_fallback(self, tmp_path, rng):
        from temporalalignnet_tpu.data.clips import HTMClipDataset
        from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

        csv_path = tmp_path / "htm_aa.csv"
        self._write_csv(csv_path, [
            {"vid": "a", "text": "cut the onion", "timestamp": 10.0},
            {"vid": "a", "text": "mix well", "timestamp": 40.0},
            {"vid": "a", "text": "add oil", "timestamp": 70.0},
            {"vid": "b", "text": "bake bread", "timestamp": 5.0},
        ])
        tok = Word2VecTokenizer(["cut", "the", "onion", "mix", "well", "add",
                                 "oil", "bake", "bread"], max_words=6)

        calls = []

        def fake_decoder(path, ts, T, fps, S, rng=None, center_crop_only=False):
            calls.append((path, ts))
            if ts == 40.0:
                raise RuntimeError("decode fail")  # grey fallback path
            return np.full((T, S, S, 3), 0.25, np.float32)

        ds = HTMClipDataset(
            str(csv_path), str(tmp_path), tokenizer=tok,
            num_frames=4, fps=5, num_sample_per_video=2, crop_size=16,
            max_words=6, decoder=fake_decoder, check_existence=False,
        )
        assert ds.vid_list == ["a", "b"]
        r = np.random.RandomState(0)
        s = ds.sample(0, r)
        assert s["clips"].shape == (2, 4, 16, 16, 3)
        assert s["input_ids"].shape == (2, 6)
        # 'b' has 1 row but asks 2 samples -> sampled with replacement
        s2 = ds.sample(1, r)
        assert (s2["input_ids"][0] == s2["input_ids"][1]).all()
        # inject the failing timestamp deterministically
        grey = [c for c in calls if c[1] == 40.0]
        if grey:
            pass  # fallback exercised above when chosen
        failing = ds.anno["a"][1]
        out = ds.decoder
        clip = None
        try:
            clip = out(str(tmp_path / "a.mp4"), 40.0, 4, 5, 16, rng=r)
        except RuntimeError:
            clip = None
        assert clip is None  # decoder raises; dataset.sample catches to grey

    def test_vlen_filter(self, tmp_path):
        from temporalalignnet_tpu.data.clips import HTMClipDataset

        csv_path = tmp_path / "htm_aa.csv"
        self._write_csv(csv_path, [
            {"vid": "ok", "text": "x", "timestamp": 1.0},
            {"vid": "short", "text": "x", "timestamp": 1.0},
            {"vid": "long", "text": "x", "timestamp": 1.0},
        ])
        ds = HTMClipDataset(
            str(csv_path), str(tmp_path),
            vlen_table={"ok": 100, "short": 10, "long": 5000},
            decoder=lambda *a, **k: np.zeros((4, 8, 8, 3), np.float32),
            check_existence=False, num_frames=4, crop_size=8,
        )
        assert ds.vid_list == ["ok"]


class TestLinearProbe:
    def test_separable_classes(self, rng):
        from temporalalignnet_tpu.eval.linear_probe import linear_probe

        C, D, n = 5, 16, 40
        centers = rng.randn(C, D) * 3
        def make(n_per):
            X, y = [], []
            for c in range(C):
                X.append(centers[c] + 0.3 * rng.randn(n_per, D))
                y.append(np.full(n_per, c))
            return np.concatenate(X).astype(np.float32), np.concatenate(y)
        Xtr, ytr = make(n)
        Xte, yte = make(10)
        m = linear_probe(Xtr, ytr, Xte, yte, num_classes=C, steps=300)
        assert m["top1"] >= 0.95, m
        assert m["top5"] == 1.0

    def test_probe_on_s3d_embeddings(self, rng):
        """End-to-end: S3D embeddings of color-coded clips are linearly
        separable by class."""
        import jax
        from temporalalignnet_tpu.eval.linear_probe import linear_probe
        from temporalalignnet_tpu.models.s3d import S3D

        model = S3D()
        clips0 = jnp.asarray(rng.rand(2, 4, 32, 32, 3) * 0.2, jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), clips0)

        def embed(batch):
            return np.asarray(model.apply(variables, jnp.asarray(batch),
                                          return_embedding=True))

        def clipset(color, n):
            base = np.zeros((n, 4, 32, 32, 3), np.float32)
            base[..., color] = 0.8
            return base + 0.05 * rng.rand(n, 4, 32, 32, 3).astype(np.float32)

        Xtr = np.concatenate([embed(clipset(c, 6)) for c in range(3)])
        ytr = np.repeat(np.arange(3), 6)
        Xte = np.concatenate([embed(clipset(c, 3)) for c in range(3)])
        yte = np.repeat(np.arange(3), 3)
        m = linear_probe(Xtr, ytr, Xte, yte, num_classes=3, steps=200)
        assert m["top1"] >= 0.8, m
