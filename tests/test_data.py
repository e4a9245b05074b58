"""Data pipeline tests: fake dataset ranges, collate, bucketing."""

import numpy as np
import pytest

from myrtlespeech_tpu.config.schema import FakeSpeechToTextConfig, IntRange
from myrtlespeech_tpu.data.alphabet import Alphabet
from myrtlespeech_tpu.data.batch import (BucketedLoader, bucket_for, collate,
                                         geometric_buckets)
from myrtlespeech_tpu.data.dataset.fake import FakeSpeechToText


def _cfg(**kw):
    base = dict(dataset_len=20, audio_ms=IntRange(100, 300),
                label_symbols="abc", label_len=IntRange(1, 5), seed=0)
    base.update(kw)
    return FakeSpeechToTextConfig(**base)


def test_fake_dataset_respects_ranges():
    ds = FakeSpeechToText(_cfg())
    assert len(ds) == 20
    for i in range(20):
        wav, text = ds[i]
        assert 1600 <= len(wav) <= 4800  # 100-300 ms @ 16 kHz
        assert 1 <= len(text) <= 5
        assert set(text) <= set("abc")


def test_fake_dataset_deterministic():
    a, b = FakeSpeechToText(_cfg()), FakeSpeechToText(_cfg())
    w1, t1 = a[3]
    w2, t2 = b[3]
    np.testing.assert_array_equal(w1, w2)
    assert t1 == t2
    assert a.duration_samples(3) == len(w1)


def test_collate_padding():
    alphabet = Alphabet("abc")
    samples = [(np.ones(5, np.float32), "ab"),
               (np.ones(3, np.float32), "c")]
    batch = collate(samples, alphabet, audio_pad_to=8, label_pad_to=4)
    assert batch["wav"].shape == (2, 8)
    np.testing.assert_array_equal(batch["wav_lens"], [5, 3])
    np.testing.assert_array_equal(batch["labels"][0], [0, 1, 0, 0])
    np.testing.assert_array_equal(batch["labels"][1], [2, 0, 0, 0])
    np.testing.assert_array_equal(batch["label_lens"], [2, 1])
    assert batch["wav"][1, 3:].sum() == 0


def test_geometric_buckets():
    bk = geometric_buckets(1000, 16000)
    assert all(b % 128 == 0 for b in bk)
    assert bk[-1] >= 16000
    assert bucket_for(1, bk) == bk[0]
    assert bucket_for(16000, bk) == bk[-1]
    with pytest.raises(ValueError):
        bucket_for(bk[-1] + 1, bk)


def test_bucketed_loader_static_shapes():
    ds = FakeSpeechToText(_cfg(dataset_len=30))
    loader = BucketedLoader(ds, Alphabet("abc"), batch_size=4,
                            label_bucket=8, seed=1)
    shapes = set()
    n = 0
    for batch in loader:
        B, S = batch["wav"].shape
        assert B == 4
        assert batch["labels"].shape[1] % 8 == 0
        assert np.all(batch["wav_lens"] <= S)
        shapes.add((S, batch["labels"].shape[1]))
        n += batch["n_real"]
    assert n == 30  # padding duplicates excluded from n_real
    # bucketing bounds the number of distinct shapes
    assert len(shapes) <= 6


def test_bucketed_loader_epoch_reshuffle():
    ds = FakeSpeechToText(_cfg(dataset_len=16, audio_ms=IntRange(100, 101)))
    loader = BucketedLoader(ds, Alphabet("abc"), batch_size=4, shuffle=True)
    first = [b["wav_lens"].tolist() for b in loader]
    second = [b["wav_lens"].tolist() for b in loader]
    assert len(first) == len(second) == 4


def test_drop_remainder():
    ds = FakeSpeechToText(_cfg(dataset_len=10, audio_ms=IntRange(100, 101)))
    loader = BucketedLoader(ds, Alphabet("abc"), batch_size=4,
                            drop_remainder=True, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2  # 10 // 4


def test_prefetch_loader_equivalent():
    from myrtlespeech_tpu.data.batch import PrefetchLoader
    ds = FakeSpeechToText(_cfg(dataset_len=12))
    base = BucketedLoader(ds, Alphabet("abc"), batch_size=4, shuffle=False)
    direct = [b["wav_lens"].tolist() for b in base]
    base2 = BucketedLoader(ds, Alphabet("abc"), batch_size=4, shuffle=False)
    pre = PrefetchLoader(base2, prefetch=2)
    fetched = [b["wav_lens"].tolist() for b in pre]
    assert direct == fetched
    assert len(pre) == len(base)


def test_host_sharding_partitions():
    """Global-plan sharding: each host emits its slice of every global
    batch; real rows split evenly, per-step shapes identical across
    hosts (the property that makes global-array assembly possible)."""
    ds = FakeSpeechToText(_cfg(dataset_len=20, audio_ms=IntRange(100, 101)))
    per_shard = []
    for shard in range(2):
        loader = BucketedLoader(ds, Alphabet("abc"), batch_size=2,
                                shuffle=False, num_shards=2, shard_id=shard,
                                drop_remainder=False)
        batches = list(loader)
        per_shard.append(batches)
    # 20 samples / global batch 4 = 5 global steps, seen by BOTH hosts.
    assert [len(b) for b in per_shard] == [5, 5]
    n_real_rows = [sum(len(b["texts"]) for b in bs) for bs in per_shard]
    assert n_real_rows == [10, 10]
    for b0, b1 in zip(*per_shard):
        # Identical global shapes + global n_real on every host.
        assert b0["wav"].shape == b1["wav"].shape
        assert b0["labels"].shape == b1["labels"].shape
        assert int(b0["n_real"]) == int(b1["n_real"])
        # Slices are disjoint rows of the same global chunk.
        assert not np.array_equal(b0["wav"], b1["wav"])


class TestSyntheticSpeech:
    """Deterministic synthetic corpus (data/dataset/synthetic.py)."""

    def _cfg(self, **kw):
        from myrtlespeech_tpu.config.schema import SyntheticSpeechConfig
        return SyntheticSpeechConfig(dataset_len=8, n_words=20,
                                     min_words=1, max_words=3, **kw)

    def test_deterministic_and_split_disjoint(self):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        a = SyntheticSpeech(self._cfg())
        b = SyntheticSpeech(self._cfg())
        w0, t0 = a[3]
        w1, t1 = b[3]
        assert t0 == t1
        np.testing.assert_array_equal(w0, w1)
        ev = SyntheticSpeech(self._cfg(split="eval"))
        # Same generative process, different sentence draws.
        assert [ev[i][1] for i in range(8)] != [a[i][1] for i in range(8)]

    def test_transcript_without_render(self):
        """``transcript(i)`` equals the rendered item's text (it replays
        the first draw of the item's rng stream; tools/accuracy_ab.py
        estimates LMs from it without synthesising audio)."""
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        ds = SyntheticSpeech(self._cfg())
        for i in range(8):
            assert ds.transcript(i) == ds[i][1]

    def test_duration_matches_render(self):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        ds = SyntheticSpeech(self._cfg())
        for i in range(8):
            wav, text = ds[i]
            assert ds.duration_samples(i) == len(wav)
            assert wav.dtype == np.float32
            assert set(text) <= set(ds.cfg.symbols)

    def test_distinct_chars_distinct_audio(self):
        """Different transcripts produce audibly different signals (the
        corpus is learnable, unlike the fake dataset's pure noise)."""
        from myrtlespeech_tpu.config.schema import SyntheticSpeechConfig
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        ds = SyntheticSpeech(SyntheticSpeechConfig(dataset_len=4))
        rng = np.random.default_rng(0)
        wa = ds._render(rng, "aaaa")
        rng = np.random.default_rng(0)
        wb = ds._render(rng, "zzzz")
        n = min(len(wa), len(wb))
        corr = np.corrcoef(wa[:n], wb[:n])[0, 1]
        assert abs(corr) < 0.5

    def test_builder_integration(self):
        from myrtlespeech_tpu.builders.build import build_dataset
        ds = build_dataset(self._cfg())
        assert len(ds) == 8


def test_loader_shard_determinism():
    """Union of per-host emissions == the dataset, no overlap (SURVEY
    §2.10 N6 / VERDICT r1 #7): every sample is emitted as a real row by
    exactly one host, and the union of 3 shards' real rows is the whole
    corpus (padding duplicates are trimmed from ``texts``)."""
    from myrtlespeech_tpu.config.schema import SyntheticSpeechConfig
    from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech

    ds = SyntheticSpeech(SyntheticSpeechConfig(
        dataset_len=23, n_words=10, min_words=1, max_words=2))
    alphabet = Alphabet("_abcdefghijklmnopqrstuvwxyz ")
    seen = []
    for shard in range(3):
        loader = BucketedLoader(ds, alphabet, batch_size=2, shuffle=False,
                                shard_id=shard, num_shards=3)
        for b in loader:
            seen.extend(b["texts"])
    want = sorted(ds.transcript(i) for i in range(23))
    assert sorted(seen) == want
    # Deterministic across constructions: same shard -> same emission.
    def texts_of(shard):
        loader = BucketedLoader(ds, alphabet, batch_size=2, shuffle=False,
                                shard_id=shard, num_shards=3)
        return [tuple(b["texts"]) for b in loader]
    assert texts_of(1) == texts_of(1)


def test_loader_num_workers_same_batches():
    """Threaded sample fetch must not change batch contents or order."""
    from myrtlespeech_tpu.config.schema import SyntheticSpeechConfig
    from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech

    ds = SyntheticSpeech(SyntheticSpeechConfig(
        dataset_len=12, n_words=10, min_words=1, max_words=2))
    alphabet = Alphabet("_abcdefghijklmnopqrstuvwxyz ")
    a = BucketedLoader(ds, alphabet, 4, shuffle=True, seed=3)
    b = BucketedLoader(ds, alphabet, 4, shuffle=True, seed=3, num_workers=3)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["wav"], bb["wav"])
        np.testing.assert_array_equal(ba["labels"], bb["labels"])
        assert ba["texts"] == bb["texts"]


def test_prefetch_loader_propagates_worker_errors():
    """A crash inside the loader thread must raise in the consumer, not
    silently truncate the epoch (found by an e2e drive: an OOV transcript
    crashed collate and fit 'succeeded' with 0 batches)."""
    from myrtlespeech_tpu.data.batch import PrefetchLoader

    class Boom:
        def __iter__(self):
            yield {"ok": 1}
            raise ValueError("worker crashed")

        def __len__(self):
            return 2

        def set_epoch(self, epoch, skip_batches=0):
            pass

    loader = PrefetchLoader(Boom(), prefetch=2)
    it = iter(loader)
    assert next(it)["ok"] == 1
    with pytest.raises(ValueError, match="worker crashed"):
        list(it)


def test_alphabet_oov_error_names_symbol_and_sentence():
    from myrtlespeech_tpu.data.alphabet import Alphabet

    a = Alphabet("_ab")
    with pytest.raises(KeyError, match="'3'.*sentence"):
        a.get_indices("ab3")


class TestSyntheticSpeakers:
    """Speaker difficulty levers (VERDICT r2 #3 non-saturating benchmark)."""

    def _cfg(self, **kw):
        from myrtlespeech_tpu.config.schema import SyntheticSpeechConfig
        base = dict(dataset_len=8, n_words=20, min_words=1, max_words=3,
                    n_speakers=8, speaker_holdout=0.25)
        base.update(kw)
        return SyntheticSpeechConfig(**base)

    def test_speaker_pools_disjoint_across_splits(self):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        tr = SyntheticSpeech(self._cfg(split="train"))
        ev = SyntheticSpeech(self._cfg(split="eval"))
        assert set(tr._speaker_pool).isdisjoint(ev._speaker_pool)
        assert set(tr._speaker_pool) | set(ev._speaker_pool) == set(range(8))

    def test_deterministic_with_speakers_and_channel(self):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        a = SyntheticSpeech(self._cfg(channel_filter=True))
        b = SyntheticSpeech(self._cfg(channel_filter=True))
        w0, t0 = a[5]
        w1, t1 = b[5]
        assert t0 == t1
        np.testing.assert_array_equal(w0, w1)

    def test_duration_matches_render_with_speakers(self):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        ds = SyntheticSpeech(self._cfg(channel_filter=True))
        for i in range(8):
            wav, _ = ds[i]
            assert ds.duration_samples(i) == len(wav)

    def test_speakers_change_audio_not_text(self):
        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        legacy = SyntheticSpeech(self._cfg(n_speakers=0))
        spk = SyntheticSpeech(self._cfg())
        assert [legacy[i][1] for i in range(8)] == \
            [spk[i][1] for i in range(8)]  # transcripts unaffected
        diff = any(len(legacy[i][0]) != len(spk[i][0])
                   or not np.array_equal(legacy[i][0], spk[i][0])
                   for i in range(8))
        assert diff

    def test_no_speakers_left_raises(self):
        import pytest

        from myrtlespeech_tpu.data.dataset.synthetic import SyntheticSpeech
        with pytest.raises(ValueError, match="speakers"):
            SyntheticSpeech(self._cfg(n_speakers=1, speaker_holdout=1.0,
                                      split="train"))
