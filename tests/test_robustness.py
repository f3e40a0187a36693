"""Per-param clip, NaN-guard, train-style align dataset, multihost helpers."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import LossConfig, ModelConfig, TrainConfig
from temporalalignnet_tpu.train.optimizer import clip_per_param, make_optimizer


class TestClipping:
    def test_per_param_clip_scales_each_tensor(self):
        tx = clip_per_param(1.0)
        grads = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.3, 0.4])}
        out, _ = tx.update(grads, tx.init(grads))
        np.testing.assert_allclose(np.asarray(out["a"]), [0.6, 0.8], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(out["b"]), [0.3, 0.4], rtol=1e-5)

    def test_per_param_vs_global_mode(self):
        params = {"w": jnp.ones(4)}
        for mode in ("per_param", "global"):
            tx = make_optimizer(
                TrainConfig(clip_grad_norm=1.0, clip_mode=mode,
                            warmup_iterations=0), params
            )
            state = tx.init(params)
            updates, _ = tx.update({"w": jnp.full(4, 100.0)}, state, params)
            assert np.isfinite(np.asarray(updates["w"])).all()


class TestNaNGuard:
    def test_nonfinite_grads_skip_update(self):
        params = {"w": jnp.ones(3)}
        tx = make_optimizer(
            TrainConfig(skip_nonfinite_updates=True, warmup_iterations=0),
            params,
        )
        state = tx.init(params)
        updates, state = tx.update({"w": jnp.full(3, jnp.nan)}, state, params)
        stepped = np.asarray(jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates)["w"])
        np.testing.assert_array_equal(stepped, np.ones(3))  # unchanged
        # a finite step afterwards does move params
        updates, state = tx.update({"w": jnp.full(3, 0.5)}, state, params)
        assert not np.array_equal(
            np.asarray(updates["w"]), np.zeros(3)
        )

    def test_reference_hazard_documented_default_off(self):
        assert TrainConfig().skip_nonfinite_updates is False


class TestAlignTrainDataset:
    def test_sample_contract_with_align_labels(self, tmp_path, rng):
        from temporalalignnet_tpu.data import HTMAlignTrainDataset
        from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

        feat = tmp_path / "f"
        feat.mkdir()
        np.save(feat / "v.npy", rng.randn(120, 16))
        anno = {"v": [
            [1, 10.0, 20.0, "cut the onion"],
            [0, 0.0, 0.0, "unalignable chatter"],
            [1, 40.0, 55.0, "mix well"],
        ]}
        p = tmp_path / "htm_align.json"
        p.write_text(json.dumps(anno))
        tok = Word2VecTokenizer(["cut", "the", "onion", "mix", "well"], max_words=6)
        ds = HTMAlignTrainDataset(str(feat), str(p), tok,
                                  seq_len=32, max_sentences=4, max_words=6)
        s = ds.sample(0, np.random.RandomState(0))
        assert s["video"].shape == (32, 16)
        assert s["align"].shape == (4,)
        real = ~s["text_padding_mask"]
        assert real.sum() >= 2  # at least one alignable + the non-alignable
        assert set(np.unique(s["align"][real])) <= {0.0, 1.0}
        aligned_rows = (s["align"] == 1) & real
        assert (s["end"][aligned_rows] > s["start"][aligned_rows]).all()


class TestMultihost:
    def test_single_process_semantics(self, capsys):
        from temporalalignnet_tpu.parallel.distributed import is_master, master_print

        assert is_master()
        master_print("hello from master")
        assert "hello from master" in capsys.readouterr().out
