"""Differential parity: our transcribe_stable seek-loop driver vs the ACTUAL
reference transcribe_stable, both driven by the same deterministic fake
decode + word-timing engines (VERDICT r4 missing #2).

The fakes replace only the MODEL seams (decode, word timing, mel); every
host decision under test runs for real on both sides: the temperature
fallback ladder, no-speech skip and its logprob override, timestamp-token
segment splitting (consecutive pairs / trailing-only / none), punctuation
and zero-span pruning, instant-word pruning, ``avg_prob_threshold``
re-seek, prompt conditioning and the T>0.5 prompt reset (observable — the
fake decode embeds len(prompt) in its text), ``nonspeech_skip`` trim and
re-seek, is_silent fast-forward, silence suppression, and the final result
assembly. Outputs are compared dict-for-dict (exact floats).

Reference: /root/reference/stable_whisper/whisper_word_level/
original_whisper.py:27-774.
"""
import hashlib
import os
import sys
import types
import warnings

import numpy as np
import pytest

REFERENCE = '/root/reference'

if not os.path.isdir(os.path.join(REFERENCE, 'stable_whisper')):
    pytest.skip('reference package not available', allow_module_level=True)

torch = pytest.importorskip('torch')

if 'torchaudio' not in sys.modules:
    ta = types.ModuleType('torchaudio')
    ta.__version__ = '0.0-stub'
    ta.functional = types.ModuleType('torchaudio.functional')
    ta.transforms = types.ModuleType('torchaudio.transforms')
    sys.modules['torchaudio'] = ta
    sys.modules['torchaudio.functional'] = ta.functional
    sys.modules['torchaudio.transforms'] = ta.transforms

sys.path.insert(0, REFERENCE)
with warnings.catch_warnings():
    warnings.simplefilter('ignore')
    import stable_whisper.whisper_word_level.original_whisper as ref_mod

if 'whisper' not in sys.modules:
    # the reference AudioLoader lazily imports whisper.audio.SAMPLE_RATE
    # (reference audio/__init__.py:177); everything else already took the
    # whisper_compatibility fallback at import time. Stubbed AFTER the
    # stable_whisper import so find_spec('whisper') in whisper_compatibility
    # never sees a spec-less module.
    wa = types.ModuleType('whisper.audio')
    wa.SAMPLE_RATE = 16000
    wpkg = types.ModuleType('whisper')
    wpkg.audio = wa
    sys.modules['whisper'] = wpkg
    sys.modules['whisper.audio'] = wa

import stable_ts_tpu.transcribe as our_mod  # noqa: E402

SR = 16000
EOT = 500
TS_BEGIN = 501


def ts(sec: float) -> int:
    return TS_BEGIN + round(sec / 0.02)


class FakeTokenizer:
    eot = EOT
    timestamp_begin = TS_BEGIN

    @staticmethod
    def encode(text):
        return [ord(c) for c in text]

    @staticmethod
    def decode(tokens):
        return ''.join(chr(int(t)) for t in tokens if int(t) < EOT)


class W:
    """One scripted window: its token stream per temperature rung."""

    def __init__(self, texts=('alpha beta', 'gamma delta'), style='pairs',
                 ok_at=0.0, nsp=0.1, fail='logprob', mark_prompt=False,
                 spans=None):
        self.texts = texts
        self.style = style
        self.ok_at = ok_at
        self.nsp = nsp
        self.fail = fail
        self.mark_prompt = mark_prompt
        self.spans = spans  # explicit [(start_s, end_s), ...] per text

    def result(self, temperature, prompt_len):
        ok = temperature >= self.ok_at
        texts = list(self.texts)
        if self.mark_prompt:
            texts = [f'{t} p{prompt_len % 10}' for t in texts]
        if not ok:
            texts = [t + ' x' for t in texts]
        tokens = []
        if self.style == 'pairs':
            spans = self.spans or [(i * 4.0, i * 4.0 + 3.5)
                                   for i in range(len(texts))]
            for text, (a, b) in zip(texts, spans):
                tokens += [ts(a), *FakeTokenizer.encode(' ' + text), ts(b)]
        elif self.style == 'single_end':
            tokens = [ts(0.0), *FakeTokenizer.encode(' ' + texts[0]),
                      *FakeTokenizer.encode(' ' + ' '.join(texts[1:])),
                      ts(12.0)] if len(texts) > 1 else [
                ts(0.0), *FakeTokenizer.encode(' ' + texts[0]), ts(12.0)]
            # a single trailing timestamp after a leading one forms a
            # consecutive pair only if adjacent — here text separates them,
            # and tokens[-2:] = [text, ts] => single_timestamp_ending
        elif self.style == 'trailing_only':
            tokens = [*FakeTokenizer.encode(' ' + texts[0]), ts(10.0)]
        elif self.style == 'no_ts':
            tokens = FakeTokenizer.encode(' ' + texts[0])
        else:
            raise ValueError(self.style)
        return dict(
            tokens=tokens,
            avg_logprob=(-0.3 if ok or self.fail != 'logprob' else -2.5),
            compression_ratio=(1.2 if ok or self.fail != 'compression'
                               else 9.9),
            no_speech_prob=self.nsp,
            temperature=temperature,
        )


class ScriptEngine:
    """Counts windows by first-rung calls; deterministic on both sides as
    long as both drivers make the same decode sequence (which is the
    contract under test — a divergence fails the comparison loudly)."""

    def __init__(self, windows, first_temp):
        self.windows = windows
        self.first_temp = first_temp
        self.idx = -1

    def decode(self, temperature, prompt):
        if temperature == self.first_temp:
            self.idx += 1
        w = self.windows[min(self.idx, len(self.windows) - 1)]
        return w.result(temperature, len(prompt or []))


def _h(key: str) -> float:
    """Deterministic [0, 1) from a string."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 0xffffffff


def make_spread(zero_rate=0.0, prob=0.85):
    """The shared fake word-timing engine: spreads each segment's words
    between its start/end with md5-hashed jitter; optionally makes a
    deterministic fraction zero-duration (drives max_instant_words)."""

    def spread(segments):
        for seg in segments:
            words = seg['text'].split()
            n = max(len(words), 1)
            # the real aligner never emits reversed words; a tail window
            # whose end clips below its start collapses to zero-duration
            span = max(seg['end'] - seg['start'], 0.0)
            out = []
            for i, w in enumerate(words):
                a = seg['start'] + span * i / n
                b = seg['start'] + span * (i + 1) / n
                h = _h(f"{seg['seek']}|{seg['start']}|{i}|{w}")
                if h < zero_rate:
                    b = a
                p = round(min(prob + (h - 0.5) * 0.1, 0.99), 3)
                out.append(dict(word=' ' + w, start=round(a, 3),
                                end=round(b, 3), probability=p,
                                tokens=FakeTokenizer.encode(' ' + w)))
            seg['words'] = out
        return segments

    return spread


# -- audio builders ---------------------------------------------------------------

def audio_noise(seconds=70.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SR)) * 0.2).astype(np.float32)


def audio_bursty(seconds=70.0, seed=1):
    rng = np.random.default_rng(seed)
    out = np.zeros(int(seconds * SR), np.float32)
    t = 0
    while t < out.shape[0]:
        burst = int(rng.uniform(2.0, 5.0) * SR)
        burst = min(burst, out.shape[0] - t)
        out[t:t + burst] = (rng.standard_normal(burst) * 0.25)
        t += burst + int(rng.uniform(0.4, 1.2) * SR)
    return out


def audio_leading_silence(seconds=70.0, lead=8.0, seed=2):
    a = audio_noise(seconds, seed)
    a[:int(lead * SR)] = 0.0
    return a


def audio_mid_silence(seconds=70.0, seed=3):
    a = audio_noise(seconds, seed)
    a[int(10.0 * SR):int(16.0 * SR)] = 0.0
    return a


def audio_silent_window(seconds=95.0, seed=4):
    a = audio_noise(seconds, seed)
    a[int(30.0 * SR):int(62.0 * SR)] = 0.0
    return a


# -- harness ----------------------------------------------------------------------

def run_ours(audio, windows, spread, **opts):
    engine = ScriptEngine(
        windows, first_temp=_first_temp(opts))

    class FakeModel:
        dims = types.SimpleNamespace(n_mels=80, n_audio_ctx=1500)
        params = {}
        alignment_heads = None
        is_multilingual = True

        @staticmethod
        def embed_audio(mel):
            return np.zeros((1, 2), np.float32)

        @staticmethod
        def decode(features, options, ts_silence_mask=None):
            r = engine.decode(options.temperature, options.prompt)
            return [types.SimpleNamespace(audio_features=None, **r)]

        @staticmethod
        def get_tokenizer(language=None, task=None):
            return FakeTokenizer()

    saved = (our_mod.log_mel_spectrogram, our_mod.add_word_timestamps)
    our_mod.log_mel_spectrogram = (
        lambda a, n_mels, padding=0: np.zeros((n_mels, 3000), np.float32))
    our_mod.add_word_timestamps = (
        lambda segments, **kw: spread(segments))
    try:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            return our_mod.transcribe_stable(
                FakeModel(), audio, language='en', verbose=False, **opts)
    finally:
        our_mod.log_mel_spectrogram, our_mod.add_word_timestamps = saved


def run_reference(audio, windows, spread, **opts):
    engine = ScriptEngine(windows, first_temp=_first_temp(opts))

    class FakeRefModel:
        dims = types.SimpleNamespace(n_mels=80, n_audio_ctx=1500)
        device = torch.device('cpu')
        is_multilingual = True

    def fake_decode_stable(model, seg, options, ts_token_mask=None,
                           audio_features=None):
        r = engine.decode(options.temperature, options.prompt)
        return types.SimpleNamespace(**r), 'feats'

    saved = (ref_mod.decode_stable, ref_mod.add_word_timestamps_stable,
             ref_mod.get_tokenizer, ref_mod.log_mel_spectrogram,
             ref_mod.pad_or_trim, ref_mod.DecodingOptions)
    ref_mod.DecodingOptions = lambda **kw: types.SimpleNamespace(**kw)
    ref_mod.decode_stable = fake_decode_stable
    ref_mod.add_word_timestamps_stable = (
        lambda segments, **kw: spread(segments))
    ref_mod.get_tokenizer = lambda model, language=None, task=None: \
        FakeTokenizer()
    ref_mod.log_mel_spectrogram = (
        lambda a, n_mels, padding=0: torch.zeros((n_mels, 3000)))
    ref_mod.pad_or_trim = lambda arr, length=3000, axis=-1: arr
    try:
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            return ref_mod.transcribe_stable(
                FakeRefModel(), torch.from_numpy(audio), language='en',
                verbose=False, ignore_compatibility=True, **opts)
    finally:
        (ref_mod.decode_stable, ref_mod.add_word_timestamps_stable,
         ref_mod.get_tokenizer, ref_mod.log_mel_spectrogram,
         ref_mod.pad_or_trim, ref_mod.DecodingOptions) = saved


def _first_temp(opts):
    t = opts.get('temperature', (0.0, 0.2, 0.4, 0.6, 0.8, 1.0))
    return t if isinstance(t, (int, float)) else t[0]


def project(result):
    segs = [s.to_dict() for s in result.segments]
    return dict(text=result.text, language=result.language, segments=segs,
                nonspeech=result.nonspeech_sections)


def check(audio, windows, spread_kw=None, **opts):
    spread = make_spread(**(spread_kw or {}))
    ours = run_ours(audio, windows, spread, **opts)
    spread = make_spread(**(spread_kw or {}))
    ref = run_reference(audio, windows, spread, **opts)
    got, want = project(ours), project(ref)
    assert got == want
    return got


# -- scenarios -------------------------------------------------------------------

BASE = dict(regroup=False)


class TestTranscribeParity:
    def test_basic_pairs(self):
        r = check(audio_noise(), [W(), W(texts=('epsilon zeta',))], **BASE)
        assert r['segments']

    def test_basic_with_regroup(self):
        check(audio_noise(), [W(), W()], regroup=True)

    def test_single_end_full_window_advance(self):
        check(audio_noise(), [W(style='single_end')], **BASE)

    def test_trailing_only_duration_clip(self):
        check(audio_noise(), [W(style='trailing_only')], **BASE)

    def test_no_timestamps_whole_window(self):
        check(audio_noise(), [W(style='no_ts')], **BASE)

    def test_fallback_second_rung(self):
        check(audio_noise(), [W(ok_at=0.2), W()], **BASE)

    def test_fallback_compression_ratio(self):
        check(audio_noise(), [W(ok_at=0.4, fail='compression'), W()], **BASE)

    def test_fallback_high_temp_prompt_reset(self):
        # T=0.6 > 0.5 resets the prompt; the marker makes that observable
        check(audio_noise(),
              [W(ok_at=0.6, mark_prompt=True), W(mark_prompt=True),
               W(mark_prompt=True)], **BASE)

    def test_fallback_exhausted_uses_last_rung(self):
        check(audio_noise(), [W(ok_at=2.0), W()], **BASE)

    def test_no_speech_skip(self):
        check(audio_noise(), [W(nsp=0.9, ok_at=2.0), W()], **BASE)

    def test_no_speech_overridden_by_logprob(self):
        check(audio_noise(), [W(nsp=0.9), W()], **BASE)

    def test_punctuation_only_segment_pruned(self):
        check(audio_noise(),
              [W(texts=('alpha beta', '.', 'gamma'),
                 spans=[(0.0, 3.0), (4.0, 5.0), (6.0, 9.0)])], **BASE)

    def test_zero_span_segment_pruned(self):
        check(audio_noise(),
              [W(texts=('alpha', 'beta'),
                 spans=[(0.0, 3.0), (5.0, 5.0)])], **BASE)

    def test_instant_words_prune_segment(self):
        check(audio_noise(), [W(), W()], spread_kw=dict(zero_rate=0.7),
              **BASE)

    def test_avg_prob_threshold_reseek(self):
        check(audio_noise(), [W(style='single_end'), W()],
              spread_kw=dict(prob=0.3), avg_prob_threshold=0.5, **BASE)

    def test_avg_prob_threshold_pass_tightens_seek(self):
        check(audio_noise(), [W(style='single_end'), W(), W(), W()],
              spread_kw=dict(prob=0.9), avg_prob_threshold=0.5, **BASE)

    def test_condition_on_previous_text_off(self):
        check(audio_noise(),
              [W(mark_prompt=True), W(mark_prompt=True)],
              condition_on_previous_text=False, **BASE)

    def test_initial_prompt(self):
        check(audio_noise(), [W(mark_prompt=True), W(mark_prompt=True)],
              initial_prompt='Hello there', **BASE)

    def test_word_timestamps_off_repair_branch(self):
        # reversed span (start > end) exercises the non-word-level repair
        check(audio_noise(),
              [W(texts=('alpha', 'beta', 'gamma'),
                 spans=[(0.0, 2.0), (8.0, 3.0), (9.0, 12.0)])],
              word_timestamps=False, **BASE)

    def test_nonspeech_skip_leading_silence(self):
        check(audio_leading_silence(), [W(), W()], nonspeech_skip=2.0,
              **BASE)

    def test_nonspeech_skip_mid_window_trim(self):
        check(audio_mid_silence(), [W(), W()], nonspeech_skip=2.0, **BASE)

    def test_silent_window_fast_forward(self):
        check(audio_silent_window(), [W(), W(), W()], **BASE)

    def test_scalar_temperature(self):
        check(audio_noise(), [W(), W()], temperature=0.0, **BASE)

    def test_bursty_audio_suppression(self):
        check(audio_bursty(), [W(), W()], **BASE)

    def test_suppression_options(self):
        check(audio_bursty(), [W(), W()], suppress_word_ts=False,
              use_word_position=False, **BASE)

    @pytest.mark.parametrize('seed', [11, 22, 33])
    def test_randomized_scripts(self, seed):
        rng = np.random.default_rng(seed)
        windows = []
        for _ in range(4):
            style = ['pairs', 'single_end', 'trailing_only',
                     'no_ts'][int(rng.integers(4))]
            ok_at = [0.0, 0.0, 0.2, 0.6][int(rng.integers(4))]
            nsp = float(rng.uniform(0.0, 0.4))
            n_texts = int(rng.integers(1, 4)) if style == 'pairs' else 1
            texts = tuple(f'w{int(rng.integers(97)):02d} '
                          f'v{int(rng.integers(97)):02d}'
                          for _ in range(n_texts))
            windows.append(W(texts=texts, style=style, ok_at=ok_at,
                             nsp=nsp, mark_prompt=bool(rng.integers(2))))
        check(audio_bursty(seconds=100.0, seed=seed), windows,
              spread_kw=dict(zero_rate=float(rng.uniform(0, 0.3))), **BASE)
