"""Offline tool tests: filters, sentencify grouping, pipeline, extractor."""

import json
import os

import numpy as np
import pytest

from temporalalignnet_tpu.tools.filters import (
    filter_language,
    filter_length,
    merge_linebreaks,
)
from temporalalignnet_tpu.tools.sentencify import (
    FULL_STOP,
    LABEL_LIST,
    Sentencify,
)


class TestFilters:
    def test_filter_length(self):
        assert not filter_length(["short text here"] * 5)  # too few captions
        assert not filter_length(["one two"] * 20)  # too few words
        assert filter_length(["one two three four five six"] * 20)

    def test_filter_language_english(self):
        caps = ["now we are going to cut the onion into small pieces"] * 8
        assert filter_language(caps)

    def test_filter_language_non_english(self):
        caps = ["ahora vamos a cortar la cebolla en trozos pequenos si"] * 8
        assert not filter_language(caps)

    def test_merge_linebreaks_glitch_and_music(self):
        caps, starts, ends = merge_linebreaks(
            ["[MUSIC]", "hello there", "glitch", "  "],
            [0.0, 1.0, 5.0, 7.0],
            [0.5, 4.0, 5.1, 9.0],
        )
        assert caps == ["hello there"]  # music stripped, 0.1s glitch dropped

    def test_merge_linebreaks_rolling_two_line(self):
        # YouTube rolling captions: second row repeats as next first row
        caps, starts, ends = merge_linebreaks(
            ["hello world\nhow are you", "how are you\ntoday my friends"],
            [0.0, 2.0],
            [2.0, 4.0],
        )
        assert caps == ["hello world", "how are you today my friends"]

    def test_merge_linebreaks_overlap_average(self):
        caps, starts, ends = merge_linebreaks(
            ["first caption", "second caption"], [0.0, 1.0], [2.0, 3.0]
        )
        assert ends[0] == starts[1] == pytest.approx(1.5)

    def test_merge_startswith_dedup(self):
        caps, starts, ends = merge_linebreaks(
            ["so we", "so we take the", "so we take the onion", "and cut"],
            [0.0, 1.0, 2.0, 3.0],
            [1.0, 2.0, 3.0, 4.0],
        )
        assert caps == ["so we take the onion", "and cut"]
        assert starts[0] == 0.0 and ends[0] == 3.0


class FakePunctuator:
    """Whitespace tokenizer; punctuation predicted after fixed trigger words."""

    def __init__(self, stop_after=("onion", "pan"), label=2):  # '.O'
        self.stop_after = stop_after
        self.label = label
        self.vocab = {}

    def tokenize(self, text):
        return text.split()

    def convert_tokens_to_ids(self, tokens):
        return [self.vocab.setdefault(t, len(self.vocab) + 1000) for t in tokens]

    def predict(self, input_ids, attention_mask):
        id_to_tok = {v: k for k, v in self.vocab.items()}
        B, L = input_ids.shape
        logits = np.zeros((B, L, len(LABEL_LIST)), np.float32)
        logits[:, :, 1] = 5.0  # default 'OO'
        for b in range(B):
            for l in range(L):
                tok = id_to_tok.get(int(input_ids[b, l]))
                if tok in self.stop_after:
                    logits[b, l, :] = 0
                    logits[b, l, self.label] = 10.0
        return logits


class TestSentencify:
    def test_groups_on_predicted_full_stops(self):
        s = Sentencify(FakePunctuator())
        caps, starts, ends = s.punctuate_and_cut(
            ["we cut the onion then heat the pan", "and fry gently"],
            [0.0, 8.0],
            [8.0, 12.0],
        )
        assert caps == ["we cut the onion", "then heat the pan", "and fry gently"]
        assert starts[0] == 0.0
        assert ends[0] == pytest.approx(4.0)  # 4 of 8 tokens over 8 s
        assert starts[2] == pytest.approx(8.0)

    def test_silence_gap_cut(self):
        s = Sentencify(FakePunctuator(stop_after=()))
        caps, starts, ends = s.punctuate_and_cut(
            ["hello there friends", "welcome back"],
            [0.0, 10.0],  # > 1 s gap after 3.0
            [3.0, 12.0],
        )
        assert caps == ["hello there friends", "welcome back"]

    def test_hysteresis_partial_stop(self):
        """Commas (label 4 = ',O') only cut once the buffer reaches 20 tokens."""
        p = FakePunctuator(stop_after=("w5", "w25"), label=4)
        words = " ".join(f"w{i}" for i in range(30))
        s = Sentencify(p)
        caps, _, _ = s.punctuate_and_cut([words], [0.0], [30.0])
        # first comma at token 6 (<20) ignored; second at 26 (>=20) cuts
        assert len(caps) == 2
        assert caps[0].endswith("w25")

    def test_already_punctuated_path(self):
        s = Sentencify(FakePunctuator())
        caps, starts, ends = s.punctuate_and_cut(
            ["First sentence. And then", "a second one. Third starts"],
            [0.0, 4.0],
            [4.0, 8.0],
        )
        assert caps[0] == "First sentence."
        assert caps[1].endswith("a second one.")
        assert caps[2] == "Third starts"

    def test_wordpiece_and_apostrophe_no_cut(self):
        class WP(FakePunctuator):
            def tokenize(self, text):
                out = []
                for w in text.split():
                    if w == "cutting":
                        out += ["cut", "##ting"]
                    else:
                        out.append(w)
                return out

        p = WP(stop_after=("cut",))  # predicted stop ON the wordpiece head
        s = Sentencify(p)
        caps, _, _ = s.punctuate_and_cut(["we are cutting onions now"], [0.0], [5.0])
        # no cut inside 'cut ##ting'
        assert caps[0].startswith("we are cutting")


class TestPipeline:
    def test_three_steps(self, tmp_path):
        from temporalalignnet_tpu.tools.process_htm import (
            filter_chunks,
            sentencify_chunk,
            split_chunks,
        )

        good_caps = ["now we are going to cut the onion into pieces today"] * 15
        raw = {
            f"v{i}": {
                "text": good_caps,
                "start": [float(j) for j in range(15)],
                "end": [float(j + 1) for j in range(15)],
            }
            for i in range(4)
        }
        raw["bad_short"] = {"text": ["hi"], "start": [0.0], "end": [1.0]}
        p = tmp_path / "raw_caption.json"
        p.write_text(json.dumps(raw))

        chunks = split_chunks(str(p), str(tmp_path), num_chunks=2)
        assert len(chunks) == 2
        filtered = filter_chunks(chunks, jobs=2)
        kept = {}
        for f in filtered:
            kept.update(json.load(open(f)))
        assert "bad_short" not in kept and len(kept) == 4

        out = sentencify_chunk(filtered[0], Sentencify(FakePunctuator()))
        data = json.load(open(out))
        for vid, item in data.items():
            assert len(item["text"]) == len(item["start"]) == len(item["end"])
            assert len(item["text"]) >= 1

    def test_sentencify_chunks_prefetched_matches_serial(self, tmp_path):
        """Step-3 pipelining (prepare threads + serial punctuator) produces
        byte-identical chunk files, in order."""
        from temporalalignnet_tpu.tools.process_htm import (
            filter_chunks,
            sentencify_chunk,
            sentencify_chunks,
            split_chunks,
        )

        caps = ["now we are going to cut the onion into pieces today"] * 15
        raw = {
            f"v{i}": {
                "text": caps,
                "start": [float(j) for j in range(15)],
                "end": [float(j + 1) for j in range(15)],
            }
            for i in range(6)
        }
        p = tmp_path / "raw_caption.json"
        p.write_text(json.dumps(raw))
        filtered = filter_chunks(split_chunks(str(p), str(tmp_path), 3), jobs=2)

        outs = sentencify_chunks(filtered, Sentencify(FakePunctuator()), prefetch=2)
        assert [o.replace("sentencified", "filtered") for o in outs] == filtered
        pipelined = [json.load(open(o)) for o in outs]
        serial = [
            json.load(open(sentencify_chunk(f, Sentencify(FakePunctuator()))))
            for f in filtered
        ]
        assert pipelined == serial


class TestExtractor:
    def test_resumable_extraction(self, tmp_path, rng):
        from temporalalignnet_tpu.tools.extract_features import FeatureExtractor

        frames_by_vid = {
            "a": rng.rand(40, 8, 8, 3).astype(np.float32),
            "b": rng.rand(4, 8, 8, 3).astype(np.float32),  # shorter than 1 clip
            "bad": None,
        }

        def decoder(path, fps, size):
            vid = os.path.basename(path).split(".")[0]
            if frames_by_vid[vid] is None:
                raise RuntimeError("decode fail")
            return frames_by_vid[vid]

        def encode(clips):  # [B, T, 8, 8, 3] -> [B, 5]
            return clips.mean(axis=(1, 2, 3, 4))[:, None] * np.ones((1, 5))

        fx = FeatureExtractor(
            encode, fps=8, frames_per_feature=8, size=8, batch_size=2,
            decoder=decoder,
        )
        videos = {v: str(tmp_path / f"{v}.mp4") for v in frames_by_vid}
        out = fx.run(videos, str(tmp_path / "feats"), bad_vids=())
        names = sorted(os.path.basename(p) for p in out)
        assert names == ["a.npy", "b.npy"]  # 'bad' skipped on decode failure
        a = np.load(tmp_path / "feats" / "a.npy")
        assert a.shape == (5, 5)  # 40 frames / 8 per feature
        # resume: nothing re-extracted
        out2 = fx.run(videos, str(tmp_path / "feats"))
        assert out2 == []


class TestHTMAAGeneration:
    def test_align_corpus_threshold_and_csv(self, tmp_path, rng):
        from temporalalignnet_tpu.tools.generate_htm_aa import (
            align_corpus,
            write_htm_aa_csv,
        )

        class FakeEvaluator:
            def evaluate_video(self, item):
                n = len(item["sentences"])
                vlen = item["video"].shape[0]
                sim = np.zeros((n, vlen), np.float32)
                scores = np.zeros(n, np.float32)
                for i, s in enumerate(item["sentences"]):
                    sim[i, int(s["start"])] = 5.0  # peak at GT start
                    scores[i] = s["gt_score"]
                return {"sim": sim, "align_score": scores}

        items = [{
            "vid": "v0",
            "video": np.zeros((50, 4), np.float32),
            "sentences": [
                {"text": "good one", "start": 10.0, "end": 20.0, "gt_score": 0.9},
                {"text": "weak one", "start": 30.0, "end": 40.0, "gt_score": 0.1},
            ],
        }]
        rows = align_corpus(FakeEvaluator(), items, threshold=0.5)
        assert len(rows) == 1
        assert rows[0]["text"] == "good one"
        assert rows[0]["timestamp"] == 10.0

        out = tmp_path / "aa.csv"
        write_htm_aa_csv(rows, str(out))
        import csv as csv_mod

        back = list(csv_mod.DictReader(open(out)))
        assert back[0]["vid"] == "v0" and float(back[0]["timestamp"]) == 10.0

        # quantile mode keeps the top half
        rows_q = align_corpus(FakeEvaluator(), items, threshold_quantile=0.5)
        assert len(rows_q) == 1
