"""Fused MIL-NCE Pallas kernel: parity vs the materialized-logits loss path.

Kernel-level checks run the exact kernel code (interpret mode on CPU) against
the jnp logsumexp oracle; train-path checks prove a full train step with
ModelConfig.fused_milnce + LossConfig.use_fused_milnce reproduces the standard
path's loss, metrics, and parameter updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import LossConfig, ModelConfig, TrainConfig
from temporalalignnet_tpu.data.synthetic import synthetic_batch
from temporalalignnet_tpu.models.net import TANWithText
from temporalalignnet_tpu.ops.pallas_milnce import fused_milnce_elements
from temporalalignnet_tpu.train.train_step import create_train_state, make_train_step

MV = -6.0e4
INV_TEMP = 1.0 / 0.07


def _oracle(v, t, pm, cv, inv_temp):
    """losses/tan_loss.py::_milnce_components math on materialized logits."""
    flat = jnp.einsum("src,skc->srk", v, t, preferred_element_type=jnp.float32)
    flat = flat * inv_temp
    pos = jnp.where(pm[None], flat, MV)
    neg = jnp.where(cv[None, None], flat, MV)
    return (
        jax.nn.logsumexp(neg, -1) - jax.nn.logsumexp(pos, -1),
        jax.nn.logsumexp(neg, -2) - jax.nn.logsumexp(pos, -2),
    )


def _random_problem(rng, S=3, R=16, K=12, C=32):
    v = jnp.asarray(rng.randn(S, R, C), jnp.float32)
    t = jnp.asarray(rng.randn(S, K, C), jnp.float32)
    pm = jnp.asarray(rng.rand(R, K) < 0.2)
    cv = jnp.asarray(rng.rand(K) < 0.8)
    return v, t, pm & cv[None], cv


class TestKernel:
    def test_forward_matches_oracle(self, rng):
        v, t, pm, cv = _random_problem(rng)
        rv, rt = _oracle(v, t, pm, cv, INV_TEMP)
        fv, ft = fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
        np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ft), np.asarray(rt), atol=2e-5, rtol=1e-5)

    def test_forward_fully_masked_row(self, rng):
        """Rows with zero positives stay finite (mask_value semantics)."""
        v, t, pm, cv = _random_problem(rng)
        pm = pm.at[3].set(False)
        rv, _ = _oracle(v, t, pm, cv, INV_TEMP)
        fv, _ = fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
        assert np.isfinite(np.asarray(fv)).all()
        np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("shared_text", [False, True])
    def test_grad_matches_oracle(self, rng, shared_text):
        """Custom-VJP backward kernel vs XLA autodiff, incl. the zero-gradient
        routing of where() for fully-masked rows and the shared-text sum."""
        v, t, pm, cv = _random_problem(rng)
        pm = pm.at[3].set(False)  # one fully-masked row
        if shared_text:
            t = t[0]
        w1 = jnp.asarray(rng.randn(3, 16), jnp.float32)
        w2 = jnp.asarray(rng.randn(3, 12), jnp.float32)

        def loss_ref(v, t):
            tt = jnp.broadcast_to(t[None], (3,) + t.shape) if shared_text else t
            a, b = _oracle(v, tt, pm, cv, INV_TEMP)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        def loss_fused(v, t):
            a, b = fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(v, t)
        gf = jax.grad(loss_fused, argnums=(0, 1))(v, t)
        # interpret mode (CPU CI) reorders little; on real TPU the Mosaic vs
        # XLA f32 accumulation orders differ through the exp(x/0.07) chains
        atol = 5e-4 if jax.default_backend() != "tpu" else 3e-3
        for a, b, name in zip(gr, gf, ["dv", "dt"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=atol, rtol=6 * atol, err_msg=name
            )


TINY = dict(
    width=64, heads=4, num_encoder_layers=2, num_joint_layers=2,
    video_embed_dim=48, num_pos_embeds=128,
)


def _paired_setup(loss_kw, seed=0, mesh=None):
    """Two models differing only in the fused flag, identical params."""
    rng = np.random.RandomState(0)
    batch = synthetic_batch(
        rng, batch_size=4, seq_len=32, max_sentences=4,
        feature_dim=TINY["video_embed_dim"], vocab_size=50, max_words=8,
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if mesh is not None:
        from temporalalignnet_tpu.train.train_step import shard_batch

        batch = shard_batch(batch, mesh)
    states, steps = [], []
    for fused in (False, True):
        loss_cfg = LossConfig(use_fused_milnce=fused, **loss_kw)
        mcfg = ModelConfig(
            use_alignability_head=loss_cfg.use_alignability_head,
            fused_milnce=fused, **TINY,
        )
        model = TANWithText(mcfg, vocab_size=51)
        tcfg = TrainConfig(lr=1e-3, warmup_iterations=2, total_iterations=100)
        state, tx = create_train_state(model, tcfg, loss_cfg, batch, seed=seed,
                                       mesh=mesh)
        states.append(state)
        steps.append(make_train_step(model, tx, tcfg, loss_cfg, mesh=mesh))
    return states, steps, batch


class TestTrainPathParity:
    @pytest.mark.parametrize(
        "loss_kw",
        [
            {},  # Stage-1 init
            dict(  # Stage-2 cotrain: agreement + threshold + head
                model="cotrain",
                learn_agreement=True,
                temporal_agreement_type="keep",
                loss_threshold=0.5,
                use_alignability_head=True,
            ),
        ],
        ids=["init", "cotrain"],
    )
    def test_step_matches_standard_path(self, loss_kw):
        (s_std, s_fused), (step_std, step_fused), batch = _paired_setup(loss_kw)
        for _ in range(2):
            s_std, m_std = step_std(s_std, batch)
            s_fused, m_fused = step_fused(s_fused, batch)
        assert abs(float(m_std["loss"]) - float(m_fused["loss"])) < 2e-4, (
            float(m_std["loss"]), float(m_fused["loss"]),
        )
        for k in m_std:
            np.testing.assert_allclose(
                float(m_fused[k]), float(m_std[k]), atol=5e-4, rtol=1e-3,
                err_msg=k,
            )
        flat_std = jax.tree_util.tree_leaves_with_path(s_std.params)
        flat_fused = jax.tree_util.tree_leaves(s_fused.params)
        for (path, a), b in zip(flat_std, flat_fused):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_sharded_step_matches_standard_path(self):
        """dp4 mesh: the shard_map fused kernel (local rows, all-gathered text,
        pmax/psum column-lse merge, reduce-scattered text grad) reproduces the
        standard GSPMD logits path — global in-batch negatives included."""
        if jax.device_count() < 4:
            pytest.skip("needs the forced multi-device CPU mesh")
        from temporalalignnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(4, 1)
        loss_kw = dict(
            model="cotrain", learn_agreement=True, loss_threshold=0.5,
            use_alignability_head=True,
        )
        (s_std, s_fused), (step_std, step_fused), batch = _paired_setup(
            loss_kw, mesh=mesh
        )
        for _ in range(2):
            s_std, m_std = step_std(s_std, batch)
            s_fused, m_fused = step_fused(s_fused, batch)
        for k in m_std:
            np.testing.assert_allclose(
                float(m_fused[k]), float(m_std[k]), atol=5e-4, rtol=1e-3,
                err_msg=k,
            )
        flat_std = jax.tree_util.tree_leaves_with_path(s_std.params)
        flat_fused = jax.tree_util.tree_leaves(s_fused.params)
        for (path, a), b in zip(flat_std, flat_fused):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3,
                err_msg=jax.tree_util.keystr(path),
            )


class TestVMEMFallback:
    """K = B*N text columns can outgrow the kernel's VMEM working set; the
    row-block picker must only ever choose Mosaic-legal blocks (8-divisible)
    and callers must fall back to the dense path when nothing fits (B=128
    crashed Mosaic lowering with an illegal br=1 block before this guard)."""

    def test_pick_row_block_legal_or_none(self):
        from temporalalignnet_tpu.ops.pallas_milnce import _pick_row_block

        for R in (16, 64, 4096, 8192, 16384):
            for K in (64, 1024, 2048, 4096, 16384):
                for itemsize in (2, 4):
                    for bwd in (False, True):
                        br = _pick_row_block(R, K, 512, itemsize, bwd)
                        assert br is None or (br % 8 == 0 and R % br == 0), (
                            R, K, itemsize, bwd, br
                        )

    def test_supported_shapes(self):
        from temporalalignnet_tpu.ops.pallas_milnce import (
            _pick_row_block,
            _pick_tiled_blocks,
            fused_milnce_supported,
        )

        # bench config B=64 (T=64, N=16, width 512, bf16): untiled fits
        assert fused_milnce_supported(4096, 1024, 512, 2)
        assert _pick_row_block(4096, 1024, 512, 2, True) is not None
        # B=128: the untiled backward's [K, C] t-in + dt-out + f32 acc want
        # 16.4 MB of scoped VMEM (measured > the 16 MB limit) — the
        # column-tiled kernels take over instead of the dense fallback
        assert _pick_row_block(8192, 2048, 512, 2, True) is None
        assert fused_milnce_supported(8192, 2048, 512, 2)
        # B=256: tiled as well (forward also outgrows the untiled budget)
        assert fused_milnce_supported(16384, 4096, 512, 2)
        # f32 at B=256 still fits tiled
        assert fused_milnce_supported(16384, 4096, 512, 4)
        # K not a 128-multiple and untiled too big: supported via padding
        # (fused_milnce_elements pads the text axis 4056 -> 4096 with
        # col_valid=False columns and the tiled plan runs)
        assert fused_milnce_supported(16384, 4056, 512, 4)
        # rows not 8-divisible: genuinely unsupported (Mosaic block rule)
        assert not fused_milnce_supported(16380, 4096, 512, 4)
        # feature dim so large even the minimal (8, 128) tile blows VMEM
        assert not fused_milnce_supported(16384, 4096, 1 << 17, 4)

    def test_pick_tiled_blocks_legal(self):
        from temporalalignnet_tpu.ops.pallas_milnce import _pick_tiled_blocks

        for R in (16, 64, 4096, 8192, 16384):
            for K in (128, 1024, 2048, 4096, 16384):
                for itemsize in (2, 4):
                    for bwd in (False, True):
                        got = _pick_tiled_blocks(R, K, 512, itemsize, bwd)
                        if got is None:
                            continue
                        br, bc = got
                        assert br % 8 == 0 and R % br == 0, (R, K, br)
                        assert bc % 128 == 0 and K % bc == 0, (R, K, bc)

    def test_tiled_forward_matches_oracle(self, rng, monkeypatch):
        """Column-tiled kernel path (forced): multi-block in BOTH grid axes,
        fully-masked row included."""
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        v, t, pm, cv = _random_problem(rng, S=2, R=32, K=256, C=32)
        pm = pm.at[3].set(False)
        monkeypatch.setattr(pmod, "_pick_row_block", lambda *a: None)
        monkeypatch.setattr(pmod, "_pick_tiled_blocks", lambda *a: (8, 128))
        rv, rt = _oracle(v, t, pm, cv, INV_TEMP)
        fv, ft = pmod.fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
        assert np.isfinite(np.asarray(fv)).all()
        np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ft), np.asarray(rt), atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("shared_text", [False, True])
    def test_tiled_grad_matches_oracle(self, rng, monkeypatch, shared_text):
        """Forced tiled path: the two-kernel backward (dv streams columns,
        dt streams rows) vs XLA autodiff on the dense oracle."""
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        S, R, K, C = 2, 32, 256, 32
        v = jnp.asarray(rng.randn(S, R, C), jnp.float32)
        t = jnp.asarray(rng.randn(S, K, C), jnp.float32)
        pm = jnp.asarray(rng.rand(R, K) < 0.2)
        cv = jnp.asarray(rng.rand(K) < 0.8)
        pm = (pm & cv[None]).at[3].set(False)
        if shared_text:
            t = t[0]
        monkeypatch.setattr(pmod, "_pick_row_block", lambda *a: None)
        monkeypatch.setattr(pmod, "_pick_tiled_blocks", lambda *a: (8, 128))
        w1 = jnp.asarray(rng.randn(S, R), jnp.float32)
        w2 = jnp.asarray(rng.randn(S, K), jnp.float32)

        def loss_ref(v, t):
            tt = jnp.broadcast_to(t[None], (S,) + t.shape) if shared_text else t
            a, b = _oracle(v, tt, pm, cv, INV_TEMP)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        def loss_fused(v, t):
            a, b = pmod.fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(v, t)
        gf = jax.grad(loss_fused, argnums=(0, 1))(v, t)
        atol = 5e-4 if jax.default_backend() != "tpu" else 3e-3
        for a, b, name in zip(gr, gf, ["dv", "dt"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=atol, rtol=6 * atol, err_msg=name
            )

    def test_tiled_matches_untiled(self, rng):
        """Auto-dispatch sanity: the tiled plan (forced via private calls)
        reproduces the untiled kernel bit-for-bit-ish on the same input."""
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        v, t, pm, cv = _random_problem(rng, S=2, R=16, K=128, C=32)
        pmf = pm.astype(jnp.float32)
        cvf = cv.astype(jnp.float32)[None, :]
        un = pmod._fwd_call(v, t, pmf, cvf, True, INV_TEMP, MV, 8)
        ti = pmod._fwd_call_tiled(v, t, pmf, cvf, True, INV_TEMP, MV, 8, 128)
        for a, b in zip(un, ti):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-6, rtol=1e-6
            )

    def test_dense_fallback_matches_kernel(self, rng, monkeypatch):
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        v, t, pm, cv = _random_problem(rng)
        kv, kt = fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
        monkeypatch.setattr(pmod, "fused_milnce_supported", lambda *a: False)
        dv, dt = pmod.fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(kv), atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(dt), np.asarray(kt), atol=2e-5, rtol=1e-5)


class TestPaddedColumns:
    """K = B*N not a 128-multiple (e.g. B=40, N=12 -> K=480): the text axis
    pads to the next plannable width with col_valid=False columns instead of
    silently losing the kernel to the dense-logits fallback.  Padded columns
    hold mask_value in every logsumexp (zero contribution), and t_el slices
    back to the caller's K."""

    @staticmethod
    def _force_tiled(monkeypatch, pmod, calls):
        # planners that only accept 128-multiple K: the pad must bridge
        # K=480 -> 512 for ANY kernel to run; the spy proves dispatch went
        # to the tiled kernel on the padded axis (not the dense fallback)
        monkeypatch.setattr(pmod, "_pick_row_block", lambda *a: None)
        monkeypatch.setattr(
            pmod, "_pick_tiled_blocks",
            lambda R, K, C, i, b: (8, 128) if K % 128 == 0 else None,
        )
        real_fwd = pmod._fwd_call_tiled

        def spy(*a, **k):
            calls.append(a[1].shape)
            return real_fwd(*a, **k)

        monkeypatch.setattr(pmod, "_fwd_call_tiled", spy)

    def test_forward_padded_matches_oracle(self, rng, monkeypatch):
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        calls = []
        self._force_tiled(monkeypatch, pmod, calls)
        v, t, pm, cv = _random_problem(rng, S=2, R=32, K=480, C=32)
        pm = pm.at[3].set(False)
        rv, rt = _oracle(v, t, pm, cv, INV_TEMP)
        fv, ft = pmod.fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
        assert ft.shape == (2, 480)
        assert calls and calls[0][1] == 512, calls  # kernel ran, padded axis
        # atol 1e-4: the padded kernel sums exp over 512 columns in four
        # streaming blocks vs the oracle's single pass (order-of-summation);
        # rtol absorbs the loss-inert log(Kp/K) shift on fully-masked
        # sentinel rows (see fused_milnce_elements)
        np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ft), np.asarray(rt), atol=1e-4, rtol=1e-5)

    @pytest.mark.parametrize("shared_text", [False, True])
    def test_grad_padded_matches_oracle(self, rng, monkeypatch, shared_text):
        """jnp.pad's VJP slices the padded text gradient back to [K, C]."""
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        calls = []
        self._force_tiled(monkeypatch, pmod, calls)
        S, R, K, C = 2, 32, 480, 32
        v = jnp.asarray(rng.randn(S, R, C), jnp.float32)
        t = jnp.asarray(rng.randn(S, K, C), jnp.float32)
        pm = jnp.asarray(rng.rand(R, K) < 0.2)
        cv = jnp.asarray(rng.rand(K) < 0.8)
        pm = (pm & cv[None]).at[3].set(False)
        if shared_text:
            t = t[0]
        w1 = jnp.asarray(rng.randn(S, R), jnp.float32)
        w2 = jnp.asarray(rng.randn(S, K), jnp.float32)

        def loss_ref(v, t):
            tt = jnp.broadcast_to(t[None], (S,) + t.shape) if shared_text else t
            a, b = _oracle(v, tt, pm, cv, INV_TEMP)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        def loss_fused(v, t):
            a, b = pmod.fused_milnce_elements(v, t, pm, cv, MV, INV_TEMP)
            return jnp.sum(a * w1) + jnp.sum(b * w2)

        gr = jax.grad(loss_ref, argnums=(0, 1))(v, t)
        gf = jax.grad(loss_fused, argnums=(0, 1))(v, t)
        assert calls, "kernel never dispatched"
        atol = 5e-4 if jax.default_backend() != "tpu" else 3e-3
        for a, b, name in zip(gr, gf, ["dv", "dt"]):
            assert np.asarray(b).shape == np.asarray(a).shape, name
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=atol, rtol=6 * atol, err_msg=name
            )

    def test_sharded_padded_matches_oracle(self, rng, monkeypatch):
        """dp4 mesh + padded text axis: the pad happens before shard_map, so
        the padded width must stay shardable (lcm(128, ndev) rounding) and
        the column-lse merge / reduce-scatter see only padded-valid math."""
        if jax.device_count() < 4:
            pytest.skip("needs the forced multi-device CPU mesh")
        import temporalalignnet_tpu.ops.pallas_milnce as pmod

        from temporalalignnet_tpu.parallel.mesh import make_mesh

        calls = []
        self._force_tiled(monkeypatch, pmod, calls)
        mesh = make_mesh(4, 1)
        v, t, pm, cv = _random_problem(rng, S=2, R=32, K=480, C=32)
        pm = pm.at[3].set(False)
        rv, rt = _oracle(v, t, pm, cv, INV_TEMP)
        fv, ft = pmod.fused_milnce_elements(
            v, t, pm, cv, MV, INV_TEMP, mesh=mesh, data_axis="data"
        )
        assert ft.shape == (2, 480)
        assert calls, "kernel never dispatched"
        np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ft), np.asarray(rt), atol=1e-4, rtol=1e-5)


class TestAutoDefault:
    """VERDICT r2 next-do #4: measured wins ship ON by default, behind the
    support gate."""

    def test_train_cli_auto_resolution(self):
        from temporalalignnet_tpu.train.cli import build_parser, resolve_fused_milnce

        # default is auto
        args = build_parser().parse_args(["--feature_dir", "x", "--captions", "y"])
        assert args.fused_milnce == "auto"
        # flagship shape (B=64, T=64, N=16, width 512): kernel plan exists
        assert resolve_fused_milnce("auto", 64, 64, 16, 512, backend="tpu")
        # B=128/256 now resolve on too (column-tiled plans)
        assert resolve_fused_milnce("auto", 128, 64, 16, 512, backend="tpu")
        assert resolve_fused_milnce("auto", 256, 64, 16, 512, backend="tpu")
        # off-TPU the interpret-mode kernel is a test vehicle, not a win
        assert not resolve_fused_milnce("auto", 64, 64, 16, 512, backend="cpu")
        # explicit override wins on any backend
        assert not resolve_fused_milnce("0", 64, 64, 16, 512, backend="tpu")
        assert resolve_fused_milnce("1", 64, 64, 16, 512, backend="cpu")
        # K=B*N not 128-divisible at a size where nothing fits untiled:
        # eligible via text-axis padding (4056 -> 4096), so auto resolves ON
        assert resolve_fused_milnce("auto", 312, 52, 13, 512, backend="tpu")
        # rows not 8-divisible stays off (no pad can fix the row axis)
        assert not resolve_fused_milnce("auto", 9, 52, 16, 512, backend="tpu")

    def test_eval_cli_auto_pallas_default(self):
        from temporalalignnet_tpu.eval.cli import build_parser

        args = build_parser().parse_args(
            ["--task", "align", "--features", "x", "--anno", "y"]
        )
        assert args.use_pallas == "auto"
