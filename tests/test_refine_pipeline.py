"""Pipelined lockstep refine (launch/collect span groups) must produce
EXACTLY the unpipelined timestamps: span bisections are independent, so
interleaving two groups' rounds may only change scheduling, never any
span's probe sequence.

Two layers:
- driver level: a deterministic numpy fake backend exposing launch/collect
  vs the same backend as a plain batch call — probe-by-probe equality.
- glue level: model.refine through the whisper batch path with the group
  pipeline forced on vs off (single group).
"""
import numpy as np
import pytest

from stable_ts_tpu.non_whisper.refinement import Refiner
from stable_ts_tpu.result import WhisperResult

SR = 16000


def make_result(n_words: int = 40, seconds: float = 40.0):
    words, t, i = [], 0.5, 0
    step = (seconds - 1.0) / n_words
    while len(words) < n_words:
        w = f' w{i % 23:02d}'
        words.append(dict(word=w, start=round(t, 2),
                          end=round(t + step * 0.6, 2), probability=0.9,
                          tokens=[30 + (i % 11), 50 + (i % 7)]))
        t += step
        i += 1
    segments = [dict(start=chunk[0]['start'], end=chunk[-1]['end'],
                     text=''.join(w['word'] for w in chunk), words=chunk)
                for chunk in (words[j:j + 8]
                              for j in range(0, len(words), 8))]
    return dict(text=''.join(w['word'] for w in words), segments=segments,
                language='en')


def fake_backend(with_pipeline: bool, log: list):
    """Deterministic (2, n) probs/ranks from each request's mute pattern."""

    def one(audio_np, tokens):
        n = len(tokens)
        frac = (np.abs(audio_np.astype(np.float64)) > 1e-9).mean(axis=-1)
        k = np.arange(n, dtype=np.float64)
        probs = 0.3 + 0.65 * frac[:, None] * (1.0 - 0.003 * (k % 5))[None, :]
        ranks = (probs < 0.55).astype(np.int64)
        return probs, ranks

    def batch(requests):
        out = []
        for audio_segment, tokens in requests:
            a = np.asarray(audio_segment, np.float64)
            if a.ndim == 1:
                a = np.repeat(a[None], 2, axis=0)
            log.append((a.tobytes(), tuple(tokens)))
            out.append(one(a, tokens))
        return out

    if with_pipeline:
        batch.launch = lambda requests, key=0: batch(requests)
        batch.collect = lambda handle: handle
    return batch


def run(with_pipeline: bool):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(int(40.0 * SR)) * 0.1).astype(np.float32)
    res = WhisperResult(make_result())
    log = []
    backend = fake_backend(with_pipeline, log)
    Refiner(inference_func=None, batch_inference_func=backend,
            max_segment_length='12s').refine(audio, res)
    ts = [(w.word, w.start, w.end) for w in res.all_words()]
    return ts, log


class TestPipelineDriver:
    def test_timestamps_identical(self):
        plain_ts, plain_log = run(False)
        piped_ts, piped_log = run(True)
        assert piped_ts == plain_ts
        # the probes must also have actually moved something
        orig = [(w['word'], w['start'], w['end'])
                for s in make_result()['segments'] for w in s['words']]
        assert plain_ts != orig

    def test_per_span_probe_sequences_identical(self):
        """Interleaving may reorder probes ACROSS spans but never change
        any single span's probe sequence (keyed by its token tuple)."""
        _, plain_log = run(False)
        _, piped_log = run(True)
        by_span_plain, by_span_piped = {}, {}
        for blob, toks in plain_log:
            by_span_plain.setdefault(toks, []).append(blob)
        for blob, toks in piped_log:
            by_span_piped.setdefault(toks, []).append(blob)
        assert by_span_piped == by_span_plain

    def test_split_shapes(self):
        split = Refiner._split_pipeline
        assert [len(g) for g in split(list(range(2)))] == [1, 1]
        assert [len(g) for g in split(list(range(5)))] == [1, 4]
        assert [len(g) for g in split(list(range(6)))] == [2, 4]
        assert [len(g) for g in split(list(range(8)))] == [4, 4]
        assert [len(g) for g in split(list(range(12)))] == [4, 8]


@pytest.fixture(scope='module')
def glue_pair():
    """model.refine with the span-group pipeline on vs forced off."""
    from stable_ts_tpu.loaders import load_test_model
    import stable_ts_tpu.alignment as al

    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(SR * 45) * 0.1).astype(np.float32)
    model = load_test_model()
    base = model.transcribe_batched(audio, verbose=None, language='en')
    assert base.has_words

    piped = model.refine(audio, base, inplace=False, parallel=True,
                         verbose=None)

    # force single-group by stripping launch/collect off the glue backend
    orig = al._whisper_refinement_batch_func

    def no_pipeline(*a, **kw):
        fn = orig(*a, **kw)
        del fn.launch, fn.collect
        return fn

    al._whisper_refinement_batch_func = no_pipeline
    try:
        plain = model.refine(audio, base, inplace=False, parallel=True,
                             verbose=None)
    finally:
        al._whisper_refinement_batch_func = orig
    return plain, piped


class TestPipelineGlue:
    def test_timestamps_identical(self, glue_pair):
        plain, piped = glue_pair
        ts_a = [(w.word, w.start, w.end)
                for s in plain.segments for w in s.words]
        ts_b = [(w.word, w.start, w.end)
                for s in piped.segments for w in s.words]
        assert ts_a == ts_b
