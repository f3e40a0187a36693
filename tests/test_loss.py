"""Loss tests: fixed-shape masked math vs independent compressed-shape numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import LossConfig
from temporalalignnet_tpu.losses.agreement import (
    agreement_self_labelling,
    circulant_last,
    _window_kernel_bank,
)
from temporalalignnet_tpu.losses.masked import masked_mean, masked_quantile, masked_std
from temporalalignnet_tpu.losses.tan_loss import get_loss, mask_from_time


def logsumexp(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)


class TestMasked:
    def test_quantile_matches_numpy_linear(self, rng):
        x = rng.randn(40).astype(np.float32)
        mask = rng.rand(40) > 0.3
        for q in [0.0, 0.3, 0.5, 0.77, 1.0]:
            ours = float(masked_quantile(jnp.asarray(x), jnp.asarray(mask), q))
            ref = float(np.quantile(x[mask], q, method="linear"))
            assert abs(ours - ref) < 1e-5, (q, ours, ref)

    def test_quantile_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(25).astype(np.float32)
        mask = rng.rand(25) > 0.4
        for q in [0.3, 0.5]:
            ours = float(masked_quantile(jnp.asarray(x), jnp.asarray(mask), q))
            ref = float(torch.quantile(torch.from_numpy(x[mask]), q))
            assert abs(ours - ref) < 1e-5

    def test_mean_std(self, rng):
        x = rng.randn(30).astype(np.float32)
        mask = rng.rand(30) > 0.5
        assert abs(float(masked_mean(jnp.asarray(x), jnp.asarray(mask))) - x[mask].mean()) < 1e-6
        assert (
            abs(float(masked_std(jnp.asarray(x), jnp.asarray(mask))) - x[mask].std(ddof=1))
            < 1e-5
        )


class TestCirculant:
    def test_docstring_example(self):
        """circulant([0,1,2]) -> [[0,1,2],[2,0,1],[1,2,0]] (loss.py:16-23)."""
        out = np.asarray(circulant_last(jnp.asarray([0.0, 1.0, 2.0])))
        np.testing.assert_array_equal(out, [[0, 1, 2], [2, 0, 1], [1, 2, 0]])

    def test_kernel_bank_windows(self):
        """Kernel row i must be an average over [i, i+dur) with boundary and
        truncation exclusions (loss.py:117-132)."""
        T, dur = 8, 3
        tgt = np.zeros((1, 1, T), np.float32)
        tgt[0, 0, 2 : 2 + dur] = 1  # duration 3
        C = np.asarray(
            _window_kernel_bank(jnp.asarray(tgt), jnp.zeros((1, 1), bool))
        )[0, 0]
        # valid start rows: window [i, i+3) fully inside, minus boundary cols 0,T-1
        row1 = C[1]
        np.testing.assert_allclose(row1[1:4], 1 / 3, atol=1e-6)
        assert row1[0] == 0 and np.all(row1[4:] == 0)
        # row 0 touches boundary col 0 -> that col zeroed; row T-3 touches col T-1
        assert C[0, 0] == 0.0
        # truncated rows at the tail have no window at all: sum < dur then zeroed
        assert np.all(C[T - 2] == 0) and np.all(C[T - 1] == 0)

    def test_padded_text_empty_kernel(self):
        tgt = np.ones((1, 1, 8), np.float32)
        C = np.asarray(_window_kernel_bank(jnp.asarray(tgt), jnp.ones((1, 1), bool)))
        assert np.all(C == 0)


def make_batch(rng, B=3, T=16, N=5, S=2):
    start = rng.randint(0, T - 4, size=(B, N)).astype(np.float32)
    end = start + rng.randint(1, 4, size=(B, N))
    pad = np.zeros((B, N), bool)
    pad[0, -1] = True
    pad[2, -2:] = True
    vpad = np.zeros((B, T), bool)
    vpad[1, -3:] = True
    batch = {
        "start": jnp.asarray(start),
        "end": jnp.asarray(end),
        "video_padding_mask": jnp.asarray(vpad),
        "text_padding_mask": jnp.asarray(pad),
        "abs_text_pos": jnp.asarray(rng.rand(B, N, 2).astype(np.float32)),
    }
    outputs = {
        "logits_dual": jnp.asarray(rng.randn(B, S, T, B, N).astype(np.float32) * 0.3),
        "logits_joint": jnp.asarray(rng.randn(B, S, T, B, N).astype(np.float32) * 0.3),
        "dual_logits_alignability": jnp.asarray(rng.randn(B, N, 1).astype(np.float32)),
        "joint_logits_alignability": jnp.asarray(
            rng.randn(B, S, N, 1).astype(np.float32)
        ),
    }
    return outputs, batch


def milnce_oracle(logits, tgt_diag, text_pad, temperature):
    """Independent compressed-shape MIL-NCE (the reference's dynamic-shape route,
    loss.py:231-275), in numpy with actual boolean indexing."""
    B, S, T, _, N = logits.shape
    logits = logits / temperature
    valid = ~text_pad.reshape(-1)  # [B*N]
    eye = np.eye(B)
    tgt = np.einsum("btn,bc->btcn", tgt_diag, eye).reshape(B * T, B * N)

    lo = logits.transpose(1, 0, 2, 3, 4).reshape(S, B * T, B * N)[:, :, valid]
    tg = tgt[:, valid] > 0

    pos = lo.copy()
    pos[:, ~tg] = -6e4
    v_num, v_den = logsumexp(pos, -1), logsumexp(lo, -1)
    row = tg.sum(-1) > 0
    t_num, t_den = logsumexp(pos, -2), logsumexp(lo, -2)
    col = tg.sum(-2) > 0
    v_loss = (v_den - v_num)[:, row].mean()
    t_loss = (t_den - t_num)[:, col].mean()
    return (v_loss + t_loss) / 2


class TestMilNCE:
    def test_matches_compressed_oracle(self, rng):
        outputs, batch = make_batch(rng)
        cfg = LossConfig(model="init")
        loss, metrics = jax.jit(lambda o, b: get_loss(o, b, cfg))(outputs, batch)

        tgt_diag = np.asarray(
            mask_from_time(
                batch["start"], batch["end"], 16, batch["text_padding_mask"]
            )
        ).transpose(0, 2, 1)
        exp_dual = milnce_oracle(
            np.asarray(outputs["logits_dual"]),
            tgt_diag,
            np.asarray(batch["text_padding_mask"]),
            cfg.temperature,
        )
        exp_joint = milnce_oracle(
            np.asarray(outputs["logits_joint"]),
            tgt_diag,
            np.asarray(batch["text_padding_mask"]),
            cfg.temperature,
        )
        np.testing.assert_allclose(float(metrics["loss-dual"]), exp_dual, rtol=2e-5)
        np.testing.assert_allclose(float(metrics["loss-joint"]), exp_joint, rtol=2e-5)
        np.testing.assert_allclose(float(loss), (exp_dual + exp_joint) / 2, rtol=2e-5)

    def test_padded_text_has_no_effect(self, rng):
        """Changing logits in padded text columns must not change the loss."""
        outputs, batch = make_batch(rng)
        cfg = LossConfig(model="init")
        loss1, _ = get_loss(outputs, batch, cfg)

        pad = np.asarray(batch["text_padding_mask"])
        ld = np.asarray(outputs["logits_dual"]).copy()
        ld[:, :, :, pad] += 100.0
        outputs2 = dict(outputs, logits_dual=jnp.asarray(ld))
        loss2, _ = get_loss(outputs2, batch, cfg)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)

    def test_gradient_flows(self, rng):
        outputs, batch = make_batch(rng)
        cfg = LossConfig(model="init")

        def f(ld):
            return get_loss(dict(outputs, logits_dual=ld), batch, cfg)[0]

        g = jax.grad(f)(outputs["logits_dual"])
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestAgreement:
    def test_keep_type_no_confidence_returns_original(self, rng):
        """With IoU threshold impossible to reach (dual/joint forced to disagree),
        'keep' must return the original targets."""
        B, S, T, N = 2, 2, 16, 3
        cfg = LossConfig(model="init", learn_agreement=True, temporal_agreement_type="keep")
        # construct diag logits whose best windows never overlap between dual/joint;
        # peaks must differ per sentence or the sentence-softmax washes them out
        jd = np.full((B, S, T, N), -5.0, np.float32)
        dd = np.full((B, S, T, N), -5.0, np.float32)
        for n in range(N):
            jd[:, :, 1 + 2 * n : 3 + 2 * n, n] = 5.0
            dd[:, :, 9 + 2 * n : 11 + 2 * n, n] = 5.0
        tgt_raw = np.zeros((B, N, T), np.float32)
        tgt_raw[:, :, 6:9] = 1.0
        pad = np.zeros((B, N), bool)
        out, metrics = agreement_self_labelling(
            jnp.asarray(jd),
            jnp.asarray(dd),
            jnp.zeros((B, T), bool),
            jnp.asarray(pad),
            jnp.asarray(tgt_raw),
            cfg,
        )
        np.testing.assert_array_equal(
            np.asarray(out), tgt_raw.transpose(0, 2, 1)
        )

    def test_perfect_agreement_relabels(self):
        """When dual and joint point at the same (shifted) window confidently,
        'keep' must adopt the self-label."""
        B, S, T, N = 1, 1, 16, 2
        cfg = LossConfig(model="init", learn_agreement=True, temporal_agreement_type="keep")
        logits = np.full((B, S, T, N), -5.0, np.float32)
        logits[0, 0, 4:7, 0] = 5.0  # sentence 0 beloved at [4,7)
        logits[0, 0, 9:12, 1] = 5.0
        tgt_raw = np.zeros((B, N, T), np.float32)
        tgt_raw[0, 0, 1:4] = 1.0  # original label elsewhere, duration 3
        tgt_raw[0, 1, 8:11] = 1.0
        out, metrics = agreement_self_labelling(
            jnp.asarray(logits),
            jnp.asarray(logits),
            jnp.zeros((B, T), bool),
            jnp.zeros((B, N), bool),
            jnp.asarray(tgt_raw),
            cfg,
        )
        out = np.asarray(out)
        # sentence 0 should move to window starting at 4 (duration 3)
        assert out[0, 4:7, 0].sum() == 3.0
        assert out[0, 1:4, 0].sum() == 0.0
        assert float(metrics["confidence-ratio"]) == 1.0

    def test_dedup_one_sentence_per_timestep(self, rng):
        """After dedup, timesteps (excluding the sentence-0 restore quirk) hold at
        most one positive."""
        B, S, T, N = 2, 2, 12, 4
        cfg = LossConfig(model="init", learn_agreement=True, temporal_agreement_type="u")
        jd = rng.randn(B, S, T, N).astype(np.float32)
        tgt_raw = np.zeros((B, N, T), np.float32)
        for b in range(B):
            for n in range(N):
                s = rng.randint(0, T - 3)
                tgt_raw[b, n, s : s + 3] = 1.0
        out = np.asarray(
            agreement_self_labelling(
                jnp.asarray(jd),
                jnp.asarray(jd + rng.randn(B, S, T, N).astype(np.float32) * 0.01),
                jnp.zeros((B, T), bool),
                jnp.zeros((B, N), bool),
                jnp.asarray(tgt_raw),
                cfg,
            )[0]
        )
        # exclude sentence 0 (restored) and refilled no-pos sentences from the check
        per_t = out[:, :, 1:].sum(-1)
        refilled = (out == tgt_raw.transpose(0, 2, 1)).all(axis=1)
        assert np.all(per_t <= 1 + tgt_raw.transpose(0, 2, 1)[:, :, 1:].sum(-1).max())


class TestBCE:
    def test_matches_torch_bce(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from temporalalignnet_tpu.losses.tan_loss import _bce_with_logits

        x = rng.randn(20).astype(np.float32)
        y = (rng.rand(20) > 0.6).astype(np.float32)
        sel = rng.rand(20) > 0.3
        pw = 2.5
        ours = float(
            _bce_with_logits(jnp.asarray(x), jnp.asarray(y), pw, jnp.asarray(sel))
        )
        ref = float(
            F.binary_cross_entropy_with_logits(
                torch.from_numpy(x[sel]),
                torch.from_numpy(y[sel]),
                pos_weight=torch.tensor(pw),
            )
        )
        assert abs(ours - ref) < 1e-3


class TestFullLoss:
    @pytest.mark.parametrize(
        "kw",
        [
            dict(model="init"),
            dict(model="init", use_alignability_head=True),
            dict(model="init", loss_threshold=0.5),
            dict(
                model="init",
                learn_agreement=True,
                use_alignability_head=True,
                loss_threshold=0.5,
            ),
            dict(
                model="cotrain",
                learn_agreement=True,
                use_alignability_head=True,
                loss_threshold=0.5,
            ),
            dict(model="init", use_alignability_head=True, optim_policy="bce"),
        ],
    )
    def test_jit_and_finite(self, rng, kw):
        outputs, batch = make_batch(rng)
        if kw.get("model") == "cotrain":
            outputs["ema-logits_dual"] = outputs["logits_dual"] * 0.9
            outputs["ema-logits_joint"] = outputs["logits_joint"] * 0.9
        cfg = LossConfig(**kw)
        loss, metrics = jax.jit(lambda o, b: get_loss(o, b, cfg))(outputs, batch)
        assert np.isfinite(float(loss))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_bce_policy_only_trains_head(self, rng):
        """optim_policy='bce' zeroes the NCE weight: gradient w.r.t. contrastive
        logits must vanish (loss.py:360-372)."""
        outputs, batch = make_batch(rng)
        cfg = LossConfig(model="init", use_alignability_head=True, optim_policy="bce")

        def f(ld):
            return get_loss(dict(outputs, logits_dual=ld), batch, cfg)[0]

        g = jax.grad(f)(outputs["logits_dual"])
        assert np.abs(np.asarray(g)).max() == 0.0


class TestSlidingMeanFastPath:
    def test_cumsum_matches_circulant_oracle(self, rng):
        """The O(BNT) cumsum sliding-window must reproduce the materialized
        [B,N,T,T] circulant kernel bank exactly (incl. boundary exclusion,
        truncated-window drops, padded sentences, and short durations)."""
        import jax.numpy as jnp

        from temporalalignnet_tpu.losses.agreement import (
            _best_window_cumsum,
            _best_window_circulant,
            _window_kernel_bank,
        )

        B, S, T, N = 3, 2, 24, 5
        logits = jnp.asarray(rng.randn(B, S, T, N), jnp.float32)
        # durations incl. 1, T-long, and padded sentences
        binary = np.zeros((B, N, T), np.float32)
        starts = rng.randint(0, T - 1, (B, N))
        lens = np.array([[1, 3, T, 7, 2]] * B)
        for b in range(B):
            for n in range(N):
                binary[b, n, starts[b, n] : starts[b, n] + lens[b, n]] = 1
        text_pad = np.zeros((B, N), bool)
        text_pad[:, -1] = True

        C = _window_kernel_bank(jnp.asarray(binary), jnp.asarray(text_pad))
        tgt_o, prob_o, logit_o = _best_window_circulant(logits, C, 0.07)

        durations = jnp.maximum(jnp.asarray(binary).sum(-1), 1.0)
        durations = jnp.where(jnp.asarray(text_pad), 0.0, durations)
        tgt_f, prob_f, logit_f = _best_window_cumsum(logits, durations, 0.07)

        np.testing.assert_allclose(np.asarray(prob_f), np.asarray(prob_o), atol=1e-6)
        np.testing.assert_allclose(np.asarray(logit_f), np.asarray(logit_o), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(tgt_f), np.asarray(tgt_o))
