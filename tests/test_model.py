"""Model-level tests: shapes, masking semantics, per-layer taps, pos-enc."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import ModelConfig
from temporalalignnet_tpu.models.posenc import linear_interpolate, sine_position_embedding
from temporalalignnet_tpu.models.tan import TemporalAligner
from temporalalignnet_tpu.models.transformer import TemporalEncoder
from temporalalignnet_tpu.models.word2vec import Word2VecEncoder, Word2VecTokenizer


def small_cfg(**kw):
    base = dict(
        width=64,
        heads=4,
        num_encoder_layers=2,
        num_joint_layers=2,
        video_embed_dim=32,
        num_pos_embeds=128,
        use_alignability_head=True,
    )
    base.update(kw)
    return ModelConfig(**base)


def make_model_and_params(cfg, B=2, T=16, N=4, seed=0):
    model = TemporalAligner(cfg)
    rng = jax.random.PRNGKey(seed)
    video = jax.random.normal(rng, (B, T, cfg.video_embed_dim))
    lang = jax.random.normal(jax.random.fold_in(rng, 1), (B, N, cfg.text_embed_dim))
    params = model.init(
        {"params": rng, "pos": jax.random.fold_in(rng, 2)},
        video,
        lang,
        deterministic=False,
    )["params"]
    return model, params, video, lang


class TestTemporalEncoder:
    def test_tap_semantics(self):
        """Per-layer taps: ln_1^{(i+1)}(out_i) for i<L, final out for i=L-1."""
        enc = TemporalEncoder(width=32, layers=3, heads=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
        params = enc.init(jax.random.PRNGKey(1), x)["params"]
        taps = enc.apply({"params": params}, x)
        assert len(taps) == 3
        assert all(t.shape == (2, 8, 32) for t in taps)
        # non-final taps are ln_1-normalized (unit variance per token); the final
        # tap is the raw residual-stream output (tfm_model.py:53-54)
        assert np.allclose(np.var(np.asarray(taps[0]), axis=-1), 1.0, atol=0.05)
        assert not np.allclose(np.var(np.asarray(taps[-1]), axis=-1), 1.0, atol=0.05)

    def test_key_padding_mask_equals_short_sequence(self):
        """Padded keys must not affect unpadded queries: running [x ; pad] with a
        mask must equal running x alone (this is what makes fixed-shape eval
        windows exact)."""
        enc = TemporalEncoder(width=32, layers=2, heads=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
        params = enc.init(jax.random.PRNGKey(1), x)["params"]

        taps_short = enc.apply({"params": params}, x)

        pad = jnp.zeros((2, 4, 32))
        x_padded = jnp.concatenate([x, pad], axis=1)
        mask = jnp.concatenate(
            [jnp.zeros((2, 6), bool), jnp.ones((2, 4), bool)], axis=1
        )
        taps_padded = enc.apply({"params": params}, x_padded, mask)

        for ts, tp in zip(taps_short, taps_padded):
            np.testing.assert_allclose(np.asarray(ts), np.asarray(tp[:, :6]), atol=1e-5)


class TestPosEnc:
    def test_sine_table_shape_and_range(self):
        t = sine_position_embedding(64, 128)
        assert t.shape == (128, 64)
        assert np.all(np.abs(np.asarray(t)) <= 1.0 + 1e-6)

    def test_linear_interpolate_matches_torch(self):
        """Golden check vs torch F.interpolate(mode='linear', align_corners=False)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        src = np.random.RandomState(0).randn(16, 8).astype(np.float32)
        for out_len in [7, 16, 33, 64]:
            ours = np.asarray(linear_interpolate(jnp.asarray(src), out_len))
            theirs = (
                F.interpolate(
                    torch.from_numpy(src).T[None], size=out_len, mode="linear",
                    align_corners=False,
                )[0]
                .T.numpy()
            )
            np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestWord2Vec:
    def test_tokenizer(self):
        tok = Word2VecTokenizer(["hello", "world", "cook"], max_words=6)
        out = tok(["Hello world!", "unknownword cook"])
        assert out["input_ids"].shape == (2, 6)
        assert out["input_ids"][0, 0] == 1 and out["input_ids"][0, 1] == 2
        assert out["input_ids"][1, 0] == 0  # OOV -> 0
        assert out["input_ids"][1, 1] == 3
        np.testing.assert_array_equal(out["attention_mask"][0], [1, 1, 0, 0, 0, 0])

    def test_masked_maxpool(self):
        enc = Word2VecEncoder(vocab_size=10, word_dim=4, hidden_dim=8, output_dim=4)
        ids = jnp.asarray([[1, 2, 0, 0], [0, 0, 0, 0]])
        mask = (ids != 0).astype(jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
        out = enc.apply({"params": params}, ids, mask)
        assert out["pooler_output"].shape == (2, 4)
        assert out["last_hidden_state"].shape == (2, 4, 4)
        # all-padding sentence must not produce the -6e4 garbage (mask forced open)
        assert np.all(np.isfinite(np.asarray(out["pooler_output"])))
        assert np.all(np.abs(np.asarray(out["pooler_output"][1])) < 1e3)

    def test_padding_does_not_change_pool(self):
        enc = Word2VecEncoder(vocab_size=10, word_dim=4, hidden_dim=8, output_dim=4)
        ids_short = jnp.asarray([[1, 2, 3, 0]])
        ids_other = jnp.asarray([[1, 2, 3, 7]])  # different token in padded slot
        mask = jnp.asarray([[1, 1, 1, 0]])
        params = enc.init(jax.random.PRNGKey(0), ids_short, mask)["params"]
        a = enc.apply({"params": params}, ids_short, mask)["pooler_output"]
        b = enc.apply({"params": params}, ids_other, mask)["pooler_output"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTemporalAligner:
    def test_forward_shapes(self):
        cfg = small_cfg()
        model, params, video, lang = make_model_and_params(cfg)
        B, T, N, S = 2, 16, 4, cfg.num_encoder_layers
        out = model.apply({"params": params}, video, lang, deterministic=True)
        assert out["logits_dual"].shape == (B, S, T, B, N)
        assert out["logits_joint"].shape == (B, cfg.num_joint_layers, T, B, N)
        assert out["dual_feature_video"].shape == (B, S, T, cfg.width)
        assert out["dual_logits_alignability"].shape == (B, N, 1)
        assert out["joint_logits_alignability"].shape == (B, cfg.num_joint_layers, N, 1)

    def test_cosine_logits_bounded(self):
        cfg = small_cfg()
        model, params, video, lang = make_model_and_params(cfg)
        out = model.apply({"params": params}, video, lang, deterministic=True)
        assert np.max(np.abs(np.asarray(out["logits_dual"]))) <= 1.0 + 1e-4
        assert np.max(np.abs(np.asarray(out["logits_joint"]))) <= 1.0 + 1e-4

    def test_random_pos_start_changes_output(self):
        cfg = small_cfg()
        model, params, video, lang = make_model_and_params(cfg, T=32)
        o1 = model.apply(
            {"params": params}, video, lang, deterministic=False,
            rngs={"pos": jax.random.PRNGKey(1)},
        )
        o2 = model.apply(
            {"params": params}, video, lang, deterministic=False,
            rngs={"pos": jax.random.PRNGKey(7)},
        )
        o_det = model.apply({"params": params}, video, lang, deterministic=True)
        assert not np.allclose(
            np.asarray(o1["logits_dual"]), np.asarray(o2["logits_dual"])
        )
        # deterministic run must be reproducible
        o_det2 = model.apply({"params": params}, video, lang, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(o_det["logits_joint"]), np.asarray(o_det2["logits_joint"])
        )

    def test_text_padding_mask_isolates_sentences(self):
        """Joint-encoder outputs for real sentences must be identical whether
        inactive sentences are passed masked or not passed at all — the property
        the fixed-shape eval relies on (eval_zeroshot_align.py:169-180)."""
        cfg = small_cfg(random_pos_start=False)
        model, params, video, lang = make_model_and_params(cfg, N=4)
        B, T = video.shape[:2]

        # full set, sentences 2..3 masked out
        mask = jnp.asarray([[False, False, True, True]] * B)
        sim_masked = model.apply(
            {"params": params},
            video,
            lang,
            video_padding_mask=jnp.zeros((B, T), bool),
            lang_padding_mask=mask,
            method="get_text_visual_sims",
        )["sim"]

        # only the active subset
        sim_subset = model.apply(
            {"params": params},
            video,
            lang[:, :2],
            method="get_text_visual_sims",
        )["sim"]

        np.testing.assert_allclose(
            np.asarray(sim_masked[:, :, :, :2]), np.asarray(sim_subset), atol=1e-5
        )

    def test_interpolate_from_path(self):
        cfg = small_cfg(random_pos_start=False)
        model, params, video, lang = make_model_and_params(cfg, T=16)
        sims = model.apply(
            {"params": params},
            video,
            lang,
            interpolate_from=8,
            method="get_text_visual_sims",
        )
        assert sims["sim"].shape[2] == 16

    def test_zero_encoder_layers(self):
        cfg = small_cfg(num_encoder_layers=0, use_alignability_head=False)
        model, params, video, lang = make_model_and_params(cfg)
        out = model.apply({"params": params}, video, lang, deterministic=True)
        assert out["logits_dual"].shape[1] == 1
