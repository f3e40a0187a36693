"""Data pipeline tests: on-disk fixtures through the loaders and prefetcher."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from temporalalignnet_tpu.core.config import DataConfig, LossConfig, ModelConfig, TrainConfig
from temporalalignnet_tpu.data import (
    HTMAlignDataset,
    HTMFeatureDataset,
    TrainLoader,
    YC2RetrievalDataset,
    YC2TrainDataset,
    build_vlen_table,
    pad_video_by_last,
)
from temporalalignnet_tpu.models.word2vec import Word2VecTokenizer

VOCAB = ["cut", "the", "onion", "into", "small", "pieces", "add", "oil", "pan",
         "mix", "well", "bake", "for", "ten", "minutes", "unk"]
CDIM = 16


@pytest.fixture
def htm_root(tmp_path):
    """Feature dir + captions json + holdout file, reference-compatible layout."""
    rng = np.random.RandomState(0)
    feat_dir = tmp_path / "features"
    feat_dir.mkdir()
    captions = {}
    # 12 usable videos (vlen 100..210), 1 too-short, 1 too-long, 1 holdout
    vids = [f"vid{i:02d}" for i in range(12)] + ["short", "long", "held"]
    for i, vid in enumerate(vids):
        vlen = {"short": 50, "long": 1200}.get(vid, 100 + i * 10)
        np.save(feat_dir / f"{vid}.mp4.npy", rng.randn(vlen, CDIM).astype(np.float16))
        n_caps = 12
        bounds = np.sort(rng.choice(np.arange(2, vlen - 2), n_caps + 1, replace=False))
        captions[vid] = {
            "text": [
                " ".join(rng.choice(VOCAB, rng.randint(3, 7)))
                for _ in range(n_caps)
            ],
            "start": bounds[:-1].astype(float).tolist(),
            "end": bounds[1:].astype(float).tolist(),
        }
    cap_path = tmp_path / "sentencified_htm_test.json"
    cap_path.write_text(json.dumps(captions))
    holdout = tmp_path / "holdout.txt"
    holdout.write_text("held\n")
    return dict(
        feature_dir=str(feat_dir), captions=str(cap_path), holdout=str(holdout)
    )


@pytest.fixture
def tokenizer():
    return Word2VecTokenizer(VOCAB, max_words=8)


CFG = DataConfig(seq_len=32, max_sentences=6, max_words=8, batch_size=4, feature_dim=CDIM)


class TestHTMDataset:
    def test_split_and_filters(self, htm_root, tokenizer):
        train = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG, "train",
            tokenizer, holdout=htm_root["holdout"], min_vlen=64, max_vlen=1000,
        )
        val = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG, "val",
            tokenizer, holdout=htm_root["holdout"], min_vlen=64, max_vlen=1000,
        )
        ids = set(train.video_ids) | set(val.video_ids)
        assert "held" not in ids  # holdout removed (loader_htm.py:92-93)
        assert "short" not in ids and "long" not in ids  # vlen filter (:96-98)
        assert len(ids) == 12
        # val = first min(5%, 1000): 12 * 0.05 -> 0 vids
        assert len(val) == 0 and len(train) == 12
        # the generated vlen table is cached and reusable
        cache = os.path.join(htm_root["feature_dir"], "htm_vlen.generated.csv")
        assert os.path.exists(cache)

    def test_sample_contract(self, htm_root, tokenizer):
        ds = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG, "train", tokenizer
        )
        rng = np.random.RandomState(1)
        T, N, W = CFG.seq_len, CFG.max_sentences, CFG.max_words
        for i in range(len(ds)):
            s = ds.sample(i, rng)
            assert s["video"].shape == (T, CDIM)
            assert s["input_ids"].shape == (N, W)
            assert s["start"].shape == (N,) and s["end"].shape == (N,)
            assert s["abs_text_pos"].shape == (N, 2)
            real = ~s["text_padding_mask"]
            assert real.any()
            # real sentences have tokens; padded rows are all-zero
            assert (s["input_ids"][real].sum(-1) > 0).all()
            assert (s["input_ids"][s["text_padding_mask"]] == 0).all()
            # window-relative timestamps within [0, T], start < end
            assert (s["start"][real] >= 0).all() and (s["end"][real] <= T).all()
            assert (s["start"][real] < s["end"][real]).all()
            assert ((s["abs_text_pos"] >= 0) & (s["abs_text_pos"] <= 1)).all()

    def test_window_content_matches_source(self, htm_root, tokenizer):
        """The cut window must be a verbatim slice of the stored features."""
        ds = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"],
            CFG, "train", tokenizer,
        )
        # val/test mode exposes cut_start/cut_end (loader_htm.py:168-170)
        ds.mode = "val"
        rng = np.random.RandomState(2)
        s = ds.sample(0, rng)
        vid = ds.video_ids[0]
        full = np.load(
            os.path.join(htm_root["feature_dir"], f"{vid}.mp4.npy")
        ).astype(np.float32)
        c0 = int(s["cut_start"])
        valid = (~s["video_padding_mask"]).sum()
        np.testing.assert_array_equal(s["video"][:valid], full[c0 : c0 + valid])

    def test_host_cache_is_bit_identical(self, htm_root, tokenizer):
        """The per-video LRU (memmap slice + cached caption tokens) must be
        invisible: same rng -> byte-equal samples vs cache_videos=0 (the
        reference-style reload/retokenize path), including repeat visits,
        eviction (cache smaller than the corpus), and threaded loading."""
        kw = dict(mode="train", tokenizer=tokenizer)
        cached = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG,
            cache_videos=3, **kw,  # 3 < 12 vids -> constant eviction
        )
        plain = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG,
            cache_videos=0, **kw,
        )
        for trial in range(36):
            i = trial % len(cached)
            a = cached.sample(i, np.random.RandomState(trial))
            b = plain.sample(i, np.random.RandomState(trial))
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k}@{i}")
                assert a[k].dtype == b[k].dtype
        # threaded loader over the cached dataset matches the plain one
        la = TrainLoader(cached, batch_size=4, shuffle=True, seed=7, num_workers=4)
        lb = TrainLoader(plain, batch_size=4, shuffle=True, seed=7, num_workers=4)
        for ba, bb in zip(la, lb):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])

    def test_unk_fallback(self, tmp_path, tokenizer):
        """Videos whose captions are unusable produce the [UNK] window
        (loader_htm.py:230-239)."""
        feat_dir = tmp_path / "f"
        feat_dir.mkdir()
        np.save(feat_dir / "v.mp4.npy", np.random.randn(100, CDIM))
        caps = {"v": {"text": ["hello"], "start": [150.0], "end": [160.0]}}  # beyond vlen
        ds = HTMFeatureDataset(str(feat_dir), caps, CFG, "train", tokenizer)
        s = ds.sample(0, np.random.RandomState(0))
        real = ~s["text_padding_mask"]
        assert real.sum() == 1
        assert s["start"][0] == 0 and s["end"][0] == CFG.seq_len
        # window anchored at 0 (no_caption path)
        assert not s["video_padding_mask"].any()

    def test_pad_video_by_last(self):
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        v, m = pad_video_by_last(x, 5)
        np.testing.assert_array_equal(v[2], v[3])
        np.testing.assert_array_equal(v[3], v[4])
        np.testing.assert_array_equal(m, [False, False, False, True, True])


class TestJsonlCaptionStore:
    """The offset-indexed caption store (370k-scale startup, VERDICT r4 #3)
    must be a bit-identical drop-in for the monolithic dict."""

    def _convert(self, json_path, tmp_path):
        from temporalalignnet_tpu.tools.convert_captions import convert

        out = str(tmp_path / "caps.jsonl")
        convert(str(json_path), out)
        return out

    def test_store_matches_dict(self, htm_root, tmp_path):
        from temporalalignnet_tpu.data.htm import JsonlCaptionStore

        with open(htm_root["captions"]) as f:
            ref = json.load(f)
        store = JsonlCaptionStore(self._convert(htm_root["captions"], tmp_path))
        assert list(store) == list(ref) and len(store) == len(ref)
        for vid in ref:
            assert vid in store
            assert store[vid] == ref[vid]

    def test_dataset_from_jsonl_is_bit_identical(self, htm_root, tokenizer, tmp_path):
        jsonl = self._convert(htm_root["captions"], tmp_path)
        kw = dict(mode="train", tokenizer=tokenizer, holdout=htm_root["holdout"])
        a = HTMFeatureDataset(htm_root["feature_dir"], htm_root["captions"], CFG, **kw)
        b = HTMFeatureDataset(htm_root["feature_dir"], jsonl, CFG, **kw)
        assert a.video_ids == b.video_ids
        for trial in range(2 * len(a)):
            i = trial % len(a)
            sa = a.sample(i, np.random.RandomState(trial))
            sb = b.sample(i, np.random.RandomState(trial))
            for k in sa:
                np.testing.assert_array_equal(sa[k], sb[k], err_msg=f"{k}@{i}")

    def test_streaming_converter_edges(self, tmp_path, monkeypatch):
        """Unicode, escaped quotes in vids, htm-fe string values, empty dict,
        and values split across refill boundaries (1-byte chunks)."""
        import temporalalignnet_tpu.tools.convert_captions as cc
        from temporalalignnet_tpu.data.htm import JsonlCaptionStore

        data = {
            'we"ird\\vid': {"text": ["a"], "start": [1.5], "end": [2.5]},
            "unié中": {"text": ["café 中文"],
                                "start": [0.25], "end": [12.0]},
            "htmfe_vid": "per_video/htmfe_vid.csv",  # htm-fe path layout
            "nums": {"text": [], "start": [], "end": []},
        }
        src = tmp_path / "caps.json"
        src.write_text(json.dumps(data), encoding="utf-8")
        monkeypatch.setattr(cc, "_CHUNK", 1)  # worst-case refill boundaries
        out = str(tmp_path / "caps.jsonl")
        assert cc.convert(str(src), out) == len(data)
        store = JsonlCaptionStore(out)
        assert set(store) == set(data)
        for vid, rec in data.items():
            assert store[vid] == rec

        empty = tmp_path / "empty.json"
        empty.write_text("{}")
        out2 = str(tmp_path / "empty.jsonl")
        assert cc.convert(str(empty), out2) == 0
        assert len(JsonlCaptionStore(out2)) == 0


class TestTrainLoader:
    def test_batches_and_determinism(self, htm_root, tokenizer):
        ds = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG, "train", tokenizer
        )
        loader = TrainLoader(ds, batch_size=4, seed=7, num_workers=2)
        b1 = list(loader)
        assert len(b1) == len(loader) == 3
        assert b1[0]["video"].shape == (4, CFG.seq_len, CDIM)
        b2 = list(loader)  # same epoch -> identical
        np.testing.assert_array_equal(b1[0]["video"], b2[0]["video"])
        loader.set_epoch(1)  # new epoch -> new windows (per-epoch reseed)
        b3 = list(loader)
        assert not np.array_equal(b1[0]["video"], b3[0]["video"])

    def test_worker_error_propagates(self, htm_root, tokenizer):
        ds = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG, "train", tokenizer
        )
        ds.video_ids[0] = "does_not_exist"
        loader = TrainLoader(ds, batch_size=4, shuffle=False, num_workers=2)
        with pytest.raises(FileNotFoundError):
            list(loader)

    def test_feeds_train_step(self, htm_root, tokenizer):
        """Loader batches satisfy the jitted train step's contract end-to-end."""
        from temporalalignnet_tpu.models.net import TANWithText
        from temporalalignnet_tpu.train.train_step import (
            create_train_state,
            make_train_step,
        )

        ds = HTMFeatureDataset(
            htm_root["feature_dir"], htm_root["captions"], CFG, "train", tokenizer
        )
        loader = TrainLoader(ds, batch_size=4, num_workers=2)
        batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
        mcfg = ModelConfig(
            width=32, heads=2, num_encoder_layers=1, num_joint_layers=1,
            video_embed_dim=CDIM, num_pos_embeds=64,
        )
        model = TANWithText(mcfg, vocab_size=tokenizer.vocab_size)
        state, tx = create_train_state(
            model, TrainConfig(warmup_iterations=0), LossConfig(), batch
        )
        step = make_train_step(model, tx, TrainConfig(warmup_iterations=0), LossConfig())
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))


@pytest.fixture
def align_root(tmp_path):
    rng = np.random.RandomState(3)
    feat_dir = tmp_path / "af"
    feat_dir.mkdir()
    anno = {}
    for i in range(3):
        vid = f"av{i}"
        vlen = 80 + 10 * i
        np.save(feat_dir / f"{vid}.npy", rng.randn(vlen, CDIM))
        anno[vid] = [
            [1, 5.0, 12.0, "cut the onion"],
            [0, 0.0, 0.0, "mix well"],
            [1, 30.0, 45.0, "add oil"],
        ]
    p = tmp_path / "htm_align.json"
    p.write_text(json.dumps(anno))
    return dict(feature_dir=str(feat_dir), anno=str(p))


class TestEvalDatasets:
    def test_htm_align(self, align_root, tokenizer):
        ds = HTMAlignDataset(align_root["feature_dir"], align_root["anno"], tokenizer, max_words=8)
        assert len(ds) == 3
        item = ds[0]
        assert item["video"].shape[1] == CDIM
        assert [s["aligned"] for s in item["sentences"]] == [1, 0, 1]
        assert item["sentences"][0]["input_ids"].shape == (8,)
        assert item["sentences"][0]["input_ids"].sum() > 0

    def test_yc2(self, tmp_path, tokenizer):
        rng = np.random.RandomState(4)
        feat_dir = tmp_path / "yf"
        feat_dir.mkdir()
        db = {}
        for i, vid in enumerate(["yv0", "yv1", "FtHLUsOntqI", "missing"]):
            vlen = 120
            if vid != "missing":
                np.save(feat_dir / f"{vid}.npy", rng.randn(vlen, CDIM))
            db[vid] = {
                "subset": "validation",
                "duration": vlen,
                "annotations": [
                    {"segment": [5.0, 20.0], "sentence": "cut the onion"},
                    {"segment": [40.0, 80.0], "sentence": "bake for ten minutes"},
                ],
            }
        db["yv1"]["subset"] = "training"
        p = tmp_path / "youcookii_annotations_trainval.json"
        p.write_text(json.dumps({"database": db}))

        val = YC2RetrievalDataset(str(feat_dir), str(p), "val", tokenizer, max_words=8)
        # yv0 only: yv1 is training, FtHLUsOntqI is drop-listed, 'missing' has no file
        assert {c["vid"] for c in val.clips} == {"yv0"}
        assert len(val) == 2
        item = val[0]
        assert set(item) >= {"video", "start", "end", "input_ids"}

        train = YC2TrainDataset(str(feat_dir), str(p), CFG, "train", tokenizer)
        assert train.video_ids == ["yv1"]
        s = train.sample(0, np.random.RandomState(0))
        assert s["video"].shape == (CFG.seq_len, CDIM)
        assert (~s["text_padding_mask"]).sum() >= 1

    def test_align_dataset_feeds_evaluator(self, align_root, tokenizer):
        """HTMAlignDataset items run through AlignmentEvaluator end-to-end."""
        from temporalalignnet_tpu.core.config import EvalConfig
        from temporalalignnet_tpu.eval.align import AlignmentEvaluator
        from temporalalignnet_tpu.models.net import TANWithText
        import jax

        mcfg = ModelConfig(
            width=32, heads=2, num_encoder_layers=1, num_joint_layers=1,
            video_embed_dim=CDIM, num_pos_embeds=64, random_pos_start=False,
        )
        model = TANWithText(mcfg, vocab_size=tokenizer.vocab_size)
        ds = HTMAlignDataset(align_root["feature_dir"], align_root["anno"], tokenizer, max_words=8)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "pos": jax.random.PRNGKey(1)},
            jnp.zeros((1, 16, CDIM)),
            jnp.zeros((1, 2, 8), jnp.int32),
            deterministic=True,
        )["params"]
        ev = AlignmentEvaluator(model, params, EvalConfig(seq_len=16, window_stride=4, batch_windows=8))
        out = ev.evaluate(list(ds))
        assert 0.0 <= out["Recall"] <= 1.0 and 0.0 <= out["AUC"] <= 1.0
