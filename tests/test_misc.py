"""Misc coverage: TemporalDecoder, BERT bridge, meters, vis helpers, whisper logic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestTemporalDecoder:
    def test_decoder_stack_runs_with_taps(self, rng):
        from temporalalignnet_tpu.models.transformer import TemporalDecoder

        dec = TemporalDecoder(width=32, layers=3, heads=4)
        x = jnp.asarray(rng.randn(2, 6, 32), jnp.float32)
        mem = jnp.asarray(rng.randn(2, 10, 32), jnp.float32)
        mem_pad = jnp.zeros((2, 10), bool).at[:, -3:].set(True)
        params = dec.init(jax.random.PRNGKey(0), x, mem)["params"]
        taps = dec.apply({"params": params}, x, mem,
                         memory_key_padding_mask=mem_pad)
        assert len(taps) == 3
        assert all(t.shape == (2, 6, 32) for t in taps)
        # padded memory must not influence the output
        mem2 = mem.at[:, -3:].set(999.0)
        taps2 = dec.apply({"params": params}, x, mem2,
                          memory_key_padding_mask=mem_pad)
        np.testing.assert_allclose(
            np.asarray(taps[-1]), np.asarray(taps2[-1]), atol=1e-5
        )


class TestBertBridge:
    def test_tan_with_bert_forward(self, rng):
        from transformers import BertConfig

        from temporalalignnet_tpu.core.config import ModelConfig
        from temporalalignnet_tpu.models.net import TANWithText

        tiny = BertConfig(
            vocab_size=100, hidden_size=768, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=32,
        )
        cfg = ModelConfig(
            width=64, heads=4, num_encoder_layers=1, num_joint_layers=1,
            video_embed_dim=32, num_pos_embeds=64, language_model="bert",
        )
        assert cfg.text_embed_dim == 768
        model = TANWithText(cfg, bert_config=tiny)
        video = jnp.asarray(rng.randn(2, 8, 32), jnp.float32)
        ids = jnp.asarray(rng.randint(1, 100, (2, 3, 6)), jnp.int32)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            video, ids, deterministic=True,
        )["params"]
        out = model.apply({"params": params}, video, ids, deterministic=True)
        assert out["logits_dual"].shape == (2, 1, 8, 2, 3)
        assert np.isfinite(np.asarray(out["logits_joint"])).all()


class TestMeters:
    def test_topk_accuracy(self):
        from temporalalignnet_tpu.utils.meters import calc_topk_accuracy

        scores = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
        targets = np.array([1, 0, 0])
        top1, top2 = calc_topk_accuracy(scores, targets, (1, 2))
        assert top1 == pytest.approx(2 / 3)
        assert top2 == pytest.approx(2 / 3)

    def test_confusion_meter(self):
        from temporalalignnet_tpu.utils.meters import ConfusionMeter

        cm = ConfusionMeter(3)
        cm.update([0, 1, 2, 2], [0, 1, 1, 2])
        assert cm.mat[1, 2] == 1 and cm.mat.trace() == 3
        assert cm.accuracy() == pytest.approx(0.75)


class TestStepBreakdown:
    def test_percentages_and_reset(self):
        import time as time_mod

        from temporalalignnet_tpu.utils.profiling import StepBreakdown

        bd = StepBreakdown()
        with bd.measure("data"):
            time_mod.sleep(0.01)
        with bd.measure("dispatch"):
            time_mod.sleep(0.01)
        with bd.measure("fence"):
            time_mod.sleep(0.05)
        snap = bd.snapshot()
        assert set(snap) == {
            "data_pct", "dispatch_pct", "fence_pct", "other_pct", "duty_pct",
        }
        # fence dominated this window -> duty proxy reflects it
        assert snap["duty_pct"] == snap["fence_pct"] > 30.0
        assert snap["data_pct"] > 0 and snap["dispatch_pct"] > 0
        total = (
            snap["data_pct"] + snap["dispatch_pct"] + snap["fence_pct"]
            + snap["other_pct"]
        )
        assert total == pytest.approx(100.0, abs=1e-6)
        # window resets
        snap2 = bd.snapshot()
        assert snap2["fence_pct"] == 0.0


class TestVis:
    def test_second_to_time_and_link(self):
        from temporalalignnet_tpu.utils.vis import get_youtube_link, second_to_time

        assert second_to_time(3725) == "01:02:05"
        assert get_youtube_link("abc", 65).endswith("watch?v=abc&t=65")

    def test_heatmap_dump(self, tmp_path, rng):
        from temporalalignnet_tpu.utils.vis import save_similarity_heatmap

        out = save_similarity_heatmap(
            rng.rand(4, 50).astype(np.float32),
            str(tmp_path / "h.png"),
            gt_spans=[(5, 10), (12, 20), (25, 30), (35, 45)],
            texts=["a", "b", "c", "d"],
        )
        if out is not None:  # matplotlib present
            import os

            assert os.path.getsize(out) > 0


class TestWhisperLogic:
    def test_chunking(self):
        from temporalalignnet_tpu.tools.whisper_asr import chunk_for_translation

        chunks = chunk_for_translation([f"s{i}" for i in range(10)], batch_size=4)
        assert sum(len(c) for c in chunks) == 10
        assert max(len(c) for c in chunks) <= 4
        assert chunk_for_translation([], 4) == []

    def test_drop_list_resume(self, tmp_path):
        from temporalalignnet_tpu.tools.whisper_asr import remaining_after_drop_list

        (tmp_path / "a.json").write_text("{}")
        todo = remaining_after_drop_list(
            ["/x/a.wav", "/x/b.wav"], str(tmp_path)
        )
        assert todo == ["/x/b.wav"]

    def test_gated_import_error(self):
        from temporalalignnet_tpu.tools.whisper_asr import _require_whisperx

        with pytest.raises(ImportError, match="whisperx is required"):
            _require_whisperx()


class TestSmallParityBits:
    def test_csv_caption_format(self, tmp_path, rng):
        """htm-fe tag: captions dict maps vid -> per-video csv path
        (loader_htm.py:81-84,196-199)."""
        import csv as csv_mod

        from temporalalignnet_tpu.core.config import DataConfig
        from temporalalignnet_tpu.data import HTMFeatureDataset
        from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

        feat = tmp_path / "f"
        feat.mkdir()
        np.save(feat / "v.mp4.npy", rng.randn(100, 8).astype(np.float32))
        cap_csv = tmp_path / "v_caps.csv"
        with open(cap_csv, "w", newline="") as f:
            w = csv_mod.DictWriter(f, fieldnames=["text", "start", "end"])
            w.writeheader()
            for j in range(12):
                w.writerow({"text": "cut the onion", "start": j * 5.0,
                            "end": j * 5.0 + 4.0})
        tok = Word2VecTokenizer(["cut", "the", "onion"], max_words=6)
        cfg = DataConfig(seq_len=32, max_sentences=4, max_words=6, feature_dim=8)
        ds = HTMFeatureDataset(str(feat), {"v": str(cap_csv)}, cfg, "train", tok)
        s = ds.sample(0, np.random.RandomState(0))
        assert (~s["text_padding_mask"]).sum() >= 1
        assert s["input_ids"][0].sum() > 0

    def test_mask_driven_sine(self):
        from temporalalignnet_tpu.models.posenc import (
            position_embedding_sine_from_mask,
            sine_position_embedding,
        )

        pad = jnp.zeros((2, 16), bool).at[1, 8:].set(True)
        emb = position_embedding_sine_from_mask(pad, feature_dim=32)
        assert emb.shape == (2, 16, 32)
        # row 1's valid prefix spans the same normalized range as a full row
        np.testing.assert_allclose(
            np.asarray(emb[1, 7]), np.asarray(emb[0, 15]), atol=1e-5
        )

    def test_logger_and_denorm(self, tmp_path):
        from temporalalignnet_tpu.utils.logging import Logger, denormalize

        lg = Logger(str(tmp_path / "log.txt"))
        lg.log("hello")
        lg.close()
        assert "hello" in (tmp_path / "log.txt").read_text()
        x = np.zeros((2, 2, 3), np.float32)
        out = denormalize(x)
        np.testing.assert_allclose(out[0, 0], [0.485, 0.456, 0.406], atol=1e-6)
