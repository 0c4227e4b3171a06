"""Interval-mode refine (MutedSpanProbe protocol): the device-side muted-row
reconstruction must produce EXACTLY the timestamps of the materialized-audio
path — same bisection decisions, same commits. Runs the whisper glue's
lockstep batch path (parallel=True) on the CPU mesh both ways.

Also unit-pins the _IntervalSet union/difference ops against a boolean-mask
oracle, since every probe's correctness reduces to them.
"""
import numpy as np
import pytest

from stable_ts_tpu.non_whisper.refinement import _IntervalSet


class TestIntervalSet:
    def test_matches_mask_oracle_randomized(self):
        rng = np.random.default_rng(0)
        for _ in range(200):
            s = _IntervalSet()
            mask = np.zeros(1000, bool)
            for _ in range(30):
                a, b = sorted(rng.integers(0, 1000, 2).tolist())
                if rng.random() < 0.5:
                    s.add(a, b)
                    mask[a:b] = True
                else:
                    s.remove(a, b)
                    mask[a:b] = False
                got = np.zeros(1000, bool)
                for x, y in s.iv:
                    assert x < y, 'empty interval stored'
                    got[x:y] = True
                assert np.array_equal(got, mask)
            # disjoint + sorted + non-touching invariants
            for (x1, y1), (x2, y2) in zip(s.iv, s.iv[1:]):
                assert y1 < x2

    def test_touching_intervals_merge(self):
        s = _IntervalSet()
        s.add(0, 5)
        s.add(5, 10)
        assert s.iv == [(0, 10)]

    def test_remove_splits(self):
        s = _IntervalSet()
        s.add(0, 10)
        s.remove(3, 6)
        assert s.iv == [(0, 3), (6, 10)]


@pytest.fixture(scope='module')
def refined_pair():
    """One transcription refined twice: interval mode off, then on."""
    from stable_ts_tpu.loaders import load_test_model
    import os

    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(16000 * 45) * 0.1).astype(np.float32)
    model = load_test_model()
    base = model.transcribe_batched(audio, verbose=None, language='en')
    assert base.has_words

    results = {}
    for mode in ('0', '1'):
        os.environ['STABLE_TS_TPU_REFINE_INTERVALS'] = mode
        try:
            results[mode] = model.refine(audio, base, inplace=False,
                                         parallel=True, verbose=None)
        finally:
            os.environ.pop('STABLE_TS_TPU_REFINE_INTERVALS', None)
    return results['0'], results['1']


class TestIntervalModeParity:
    def test_timestamps_identical(self, refined_pair):
        audio_mode, interval_mode = refined_pair
        ts_a = [(w.word, w.start, w.end)
                for s in audio_mode.segments for w in s.words]
        ts_i = [(w.word, w.start, w.end)
                for s in interval_mode.segments for w in s.words]
        assert ts_a == ts_i

    def test_something_refined(self, refined_pair):
        # guard against the trivial pass where no probe ever ran
        audio_mode, _ = refined_pair
        assert audio_mode.has_words
