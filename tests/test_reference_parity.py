"""Differential parity: our result core vs the ACTUAL reference package.

The reference (/root/reference, mounted read-only) is import-runnable without
openai-whisper (its whisper_compatibility fallback) once torchaudio is
stubbed; its result/regroup/output layers are pure Python+numpy. Identical
inputs go through both implementations and the outputs are compared
byte-for-byte — the strongest evidence for SURVEY §7's "bit-compat output
structure" requirement.

Skipped automatically when /root/reference is not present.
"""
import json
import os
import sys
import types
import warnings

import numpy as np
import pytest

REFERENCE = '/root/reference'

if not os.path.isdir(os.path.join(REFERENCE, 'stable_whisper')):
    pytest.skip('reference package not available', allow_module_level=True)

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
    from stable_whisper import WhisperResult as RefResult  # noqa: E402

from stable_ts_tpu.result import WhisperResult as OurResult  # noqa: E402


def _random_result_dict(seed: int, n_segments: int = 4) -> dict:
    """Plausible word/segment structure with punctuation, gaps, jitter."""
    rng = np.random.default_rng(seed)
    vocab = ['Hello', 'world', 'this', 'is', 'a', 'test', 'of', 'the',
             'regroup', 'engine', 'and', 'its', 'many', 'operations', 'so',
             'some', 'words', 'are', 'long', 'short']
    t = 0.0
    segments = []
    for s in range(n_segments):
        words = []
        n_words = int(rng.integers(3, 9))
        for w in range(n_words):
            dur = float(rng.uniform(0.08, 0.5))
            text = vocab[int(rng.integers(len(vocab)))]
            if w == n_words - 1 and rng.random() < 0.7:
                text += '.' if rng.random() < 0.6 else ','
            words.append(dict(
                word=' ' + text,
                start=round(t, 3),
                end=round(t + dur, 3),
                probability=float(np.round(rng.uniform(0.3, 1.0), 3)),
                tokens=[int(rng.integers(100, 1000))],
            ))
            t += dur + float(rng.uniform(0.0, 0.12))
        segments.append(dict(words=words))
        t += float(rng.uniform(0.0, 1.2))  # inter-segment gap
    return dict(language='en', segments=segments)


def _norm(d):
    return json.dumps(d, sort_keys=True)


def both(seed: int, n_segments: int = 4):
    data = _random_result_dict(seed, n_segments)
    return RefResult(json.loads(json.dumps(data))), \
        OurResult(json.loads(json.dumps(data)))


SEEDS = [0, 1, 2, 3, 7]


class TestOutputFormats:
    @pytest.mark.parametrize('seed', SEEDS)
    def test_srt_word_level_bytes(self, seed):
        ref, ours = both(seed)
        assert ours.to_srt_vtt(word_level=True) == ref.to_srt_vtt(word_level=True)

    @pytest.mark.parametrize('seed', SEEDS)
    def test_srt_segment_only_bytes(self, seed):
        ref, ours = both(seed)
        assert (ours.to_srt_vtt(word_level=False, segment_level=True)
                == ref.to_srt_vtt(word_level=False, segment_level=True))

    @pytest.mark.parametrize('seed', SEEDS)
    def test_vtt_bytes(self, seed):
        ref, ours = both(seed)
        assert (ours.to_srt_vtt(vtt=True, word_level=True)
                == ref.to_srt_vtt(vtt=True, word_level=True))

    @pytest.mark.parametrize('seed', SEEDS[:3])
    def test_ass_bytes(self, seed):
        ref, ours = both(seed)
        assert ours.to_ass() == ref.to_ass()

    @pytest.mark.parametrize('seed', SEEDS[:3])
    def test_tsv_txt_bytes(self, seed):
        ref, ours = both(seed)
        assert ours.to_tsv() == ref.to_tsv()
        assert ours.to_txt() == ref.to_txt()

    @pytest.mark.parametrize('seed', SEEDS[:3])
    def test_karaoke_ass(self, seed):
        ref, ours = both(seed)
        assert ours.to_ass(karaoke=True) == ref.to_ass(karaoke=True)


class TestRegroupParity:
    @pytest.mark.parametrize('seed', SEEDS)
    def test_default_chain(self, seed):
        ref, ours = both(seed)
        ref.regroup(True)
        ours.regroup(True)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())

    @pytest.mark.parametrize('algo', [
        'sg=.5', 'sp=.* /。/?/？', 'sl=25', 'sd=1.0', 'mg=.3+3',
        'ms=2', 'cm', 'l=true', 'sg=.4_mg=.2_sl=30',
        'isp_cm_sp=.* /。/?/？_sg=.5_sp=,* /，++++50_sl=70_cm',
    ])
    def test_individual_ops(self, algo):
        ref, ours = both(11)
        ref.regroup(algo)
        ours.regroup(algo)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts()), algo

    @pytest.mark.parametrize('seed', SEEDS[:3])
    def test_reset_and_replay(self, seed):
        ref, ours = both(seed)
        for r in (ref, ours):
            r.regroup('sg=.5_sl=40')
            r.reset()
            r.regroup(r'cm')
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())


class TestEditOpsParity:
    def test_suppress_silence(self):
        ref, ours = both(5)
        starts = np.array([0.5, 3.0, 7.0])
        ends = np.array([0.9, 3.8, 7.5])
        ref.suppress_silence(starts, ends, min_word_dur=0.1)
        ours.suppress_silence(starts, ends, min_word_dur=0.1)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())

    def test_clamp_max_and_pad(self):
        ref, ours = both(6)
        ref.clamp_max(medium_factor=2.5)
        ours.clamp_max(medium_factor=2.5)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())

    def test_remove_words_by_str(self):
        ref, ours = both(8)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            ref.remove_words_by_str('test', case_sensitive=False, verbose=False)
            ours.remove_words_by_str('test', case_sensitive=False, verbose=False)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())

    def test_fill_in_gaps(self):
        data = _random_result_dict(9)
        other = _random_result_dict(9)  # identical content as "donor"
        ref, ours = RefResult(json.loads(json.dumps(data))), \
            OurResult(json.loads(json.dumps(data)))
        ref_other = RefResult(json.loads(json.dumps(other)))
        our_other = OurResult(json.loads(json.dumps(other)))
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            ref.fill_in_gaps(ref_other, min_gap=0.3)
            ours.fill_in_gaps(our_other, min_gap=0.3)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())

    def test_find_matches(self):
        ref, ours = both(10)
        rm = ref.find(r'\bthe\b')
        om = ours.find(r'\bthe\b')
        assert len(rm.matches) == len(om.matches)
        for a, b in zip(rm.matches, om.matches):
            assert a.text == b.text

    def test_custom_operation(self):
        ref, ours = both(12)
        ref.custom_operation('start', '>=', 5.0, 'remove', word_level=True)
        ours.custom_operation('start', '>=', 5.0, 'remove', word_level=True)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())


class TestJsonSchemaParity:
    @pytest.mark.parametrize('seed', SEEDS[:3])
    def test_to_dict_keys(self, seed):
        ref, ours = both(seed)
        rd, od = ref.to_dict(), ours.to_dict()
        assert set(rd.keys()) == set(od.keys())
        for rs, os_ in zip(rd['segments'], od['segments']):
            assert set(rs.keys()) == set(os_.keys())
            for rw, ow in zip(rs['words'], os_['words']):
                assert set(rw.keys()) == set(ow.keys())

    def test_save_load_roundtrip_cross(self, tmp_path):
        """Our JSON loads in the reference and vice versa."""
        ref, ours = both(13)
        p1 = str(tmp_path / 'ours.json')
        p2 = str(tmp_path / 'ref.json')
        ours.save_as_json(p1)
        ref.save_as_json(p2)
        assert RefResult(p1).text == ours.text
        assert OurResult(p2).text == ref.text


class TestExtendedRegroupParity:
    """Lock/remove/pad ops + error-behavior parity on malformed algo strings."""

    @pytest.mark.parametrize('algo', [
        'us', 'l=the++1+1', 'rs=2', 'rp=2+2',
        'rws=test++0+1', 'p=0.1+0.2+3.0', 'csl',
        'mp=,* /，+2', 'sp=.* /。/?/？+10+100', 'sg=.3+2+4',
    ])
    def test_op_parity(self, algo):
        ref, ours = both(42, 5)
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            ref.regroup(algo)
            ours.regroup(algo)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts()), algo

    @pytest.mark.parametrize('algo', [
        'ag=.4++.2',            # overflow arg -> local varname -> TypeError
        'fg=0.1',               # fill_in_gaps needs a result, not a float
        'sl=20+true',           # bad arg type
        'bogus=1',              # unknown method
        'l=true+false+true',    # int('true') in history recording
        'rw=1',                 # remove_word(int) without context
        'rws=test++false+false',  # int('false')
        'p=" "+" ~"',           # pad with string args
    ])
    def test_error_parity(self, algo):
        """Malformed strings fail the same way in both implementations."""
        ref, ours = both(42, 5)
        def outcome(r):
            try:
                with warnings.catch_warnings():
                    warnings.simplefilter('ignore')
                    r.regroup(algo)
                return None
            except Exception as exc:
                return type(exc).__name__
        assert outcome(ours) == outcome(ref), algo


class TestStabilizationParity:
    """Non-VAD loudness mask + mask/timing utils vs the reference (torch)."""

    def _audio(self, seed=0, seconds=4):
        rng = np.random.default_rng(seed)
        audio = (rng.standard_normal(16000 * seconds) * 0.2).astype(np.float32)
        audio[16000:32000] *= 0.01  # silent stretch
        return audio

    @pytest.mark.parametrize('seed', [0, 3, 9])
    def test_wav2mask_bit_equal(self, seed):
        import torch
        from stable_whisper.stabilization.nonvad import wav2mask as ref_fn
        from stable_ts_tpu.stabilization.nonvad import wav2mask as our_fn
        audio = self._audio(seed)
        ref_mask = np.asarray(ref_fn(torch.from_numpy(audio)))
        our_mask = np.asarray(our_fn(audio))
        assert ref_mask.shape == our_mask.shape
        assert (ref_mask == our_mask).all()

    def test_audio2timings_equal(self):
        import torch
        from stable_whisper.stabilization.nonvad import audio2timings as ref_fn
        from stable_ts_tpu.stabilization.nonvad import audio2timings as our_fn
        audio = self._audio(1)
        ref_t = ref_fn(torch.from_numpy(audio))
        our_t = our_fn(audio)
        assert (ref_t is None) == (our_t is None)
        if ref_t is not None:
            for a, b in zip(ref_t, our_t):
                assert np.allclose(np.asarray(a), np.asarray(b))

    def test_mask2timing_equal(self):
        import torch
        from stable_whisper.stabilization.utils import mask2timing as ref_fn
        from stable_ts_tpu.stabilization.utils import mask2timing as our_fn
        mask = np.zeros(100, bool)
        mask[10:20] = True
        mask[50:53] = True
        mask[97:] = True
        ref_t = ref_fn(torch.from_numpy(mask))
        our_t = our_fn(mask)
        for a, b in zip(ref_t, our_t):
            assert np.allclose(np.asarray(a), np.asarray(b))

    def test_timing2mask_roundtrip_equal(self):
        import torch
        from stable_whisper.stabilization.utils import timing2mask as ref_fn
        from stable_ts_tpu.stabilization.utils import timing2mask as our_fn
        starts = np.array([0.2, 1.5])
        ends = np.array([0.8, 1.9])
        ref_m = np.asarray(ref_fn(starts, ends, size=120))
        our_m = np.asarray(our_fn(starts, ends, size=120))
        assert (ref_m == our_m).all()


class TestFuzzedRegroupChains:
    """Seeded differential fuzzing: random DSL CHAINS (not just single ops)
    through both implementations, byte-compared. Interactions between ops —
    a merge feeding a split feeding a lock — are where fixed cases run out;
    every chain here is deterministic from its seed and becomes a frozen
    regression the moment it ever disagrees."""

    # (key, argument-candidate tuples rendered k=a+b+...); weights favor the
    # structure-churning ops so chains actually reshape the result
    _OPS = [
        ('sg', ['.3', '.5+2', '.4+1+6']),
        ('sp', ['.* /。+8', ',* /，+6+40', '.* /。/?/？']),
        ('sl', ['30', '50+1', '70']),
        ('sd', ['.8', '1.2']),
        ('mg', ['.2+12', '.3+8+30', '.15']),
        ('mp', [',* /，', ',* /，+4']),
        ('ms', ['2', '3']),
        ('cm', [None]),
        ('us', [None]),
        ('l', ['the', 'a++1', 'test++1+1']),
        ('p', ['0.1+0.1', '0.05+0.05+2.0']),
        ('csl', [None]),
        ('isp', [None]),
        ('rs', ['9']),
        ('rp', ['9+9']),
    ]

    @pytest.mark.parametrize('seed', range(40))
    def test_random_chain_parity(self, seed):
        rng = np.random.default_rng(1000 + seed)
        chain = []
        for _ in range(int(rng.integers(2, 6))):
            key, args = self._OPS[int(rng.integers(len(self._OPS)))]
            arg = args[int(rng.integers(len(args)))]
            chain.append(key if arg is None else f'{key}={arg}')
        algo = '_'.join(chain)
        ref, ours = both(7000 + seed, int(rng.integers(3, 7)))

        def outcome(r):
            try:
                with warnings.catch_warnings():
                    warnings.simplefilter('ignore')
                    r.regroup(algo)
                return ('ok', _norm(r.segments_to_dicts()))
            except Exception as exc:
                return ('err', type(exc).__name__)

        assert outcome(ours) == outcome(ref), algo


class TestFuzzedSuppressSilence:
    """Randomized silence layouts through the word-clipping rule — the
    single most behavior-critical piece of stabilization — compared
    byte-for-byte across parameter combinations the fixed case misses."""

    @pytest.mark.parametrize('seed', range(30))
    def test_random_silence_parity(self, seed):
        rng = np.random.default_rng(2000 + seed)
        ref, ours = both(3000 + seed, int(rng.integers(3, 6)))
        # random non-overlapping silence sections across the result's span
        n_sil = int(rng.integers(1, 6))
        edges = np.sort(rng.uniform(0.0, 12.0, n_sil * 2))
        starts, ends = edges[0::2], edges[1::2]
        kwargs = dict(
            min_word_dur=float(rng.choice([0.05, 0.1, 0.2])),
            word_level=bool(rng.integers(2)),
            nonspeech_error=float(rng.choice([0.1, 0.3, 1.0])),
            use_word_position=bool(rng.integers(2)),
        )
        ref.suppress_silence(starts, ends, **kwargs)
        ours.suppress_silence(starts, ends, **kwargs)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts()), kwargs


class TestFuzzedEditOps:
    """Randomized edit-op sequences (the non-DSL mutating surface) through
    both implementations. Each op draws random arguments; outcomes (result
    bytes or exception type) must match."""

    @pytest.mark.parametrize('seed', range(15))
    def test_random_edit_sequence_parity(self, seed):
        rng = np.random.default_rng(4000 + seed)

        def ops():
            yield 'clamp_max', dict(medium_factor=float(rng.choice([1.5, 2.5])),
                                    max_dur=float(rng.choice([0.0, 0.4, 1.0])) or None)
            yield 'pad', dict(start_pad=float(rng.choice([0.0, 0.1])) or None,
                              end_pad=float(rng.choice([0.0, 0.2])) or None,
                              max_dur=float(rng.choice([0.0, 2.0])) or None)
            yield 'adjust_gaps', dict(duration_threshold=float(rng.choice([0.0, 0.1, 0.5])))
            yield 'remove_words_by_str', dict(words=str(rng.choice(['test', 'the', 'zzz'])),
                                              case_sensitive=bool(rng.integers(2)),
                                              strip=bool(rng.integers(2)),
                                              verbose=False)
            yield 'convert_to_segment_level', {}

        seq = list(ops())
        order = rng.permutation(len(seq))[:int(rng.integers(2, 4))]
        ref, ours = both(5000 + seed, int(rng.integers(3, 6)))

        for k in order:
            name, kwargs = seq[int(k)]
            out_ref = out_ours = None
            try:
                getattr(ref, name)(**kwargs)
            except Exception as exc:
                out_ref = type(exc).__name__
            try:
                getattr(ours, name)(**kwargs)
            except Exception as exc:
                out_ours = type(exc).__name__
            assert out_ours == out_ref, (name, kwargs)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts()), \
            [(seq[int(k)][0]) for k in order]


class TestFuzzedOutputFormats:
    """Every renderer over a wider seed range than the fixed cases, with
    randomized per-format options — bytes must match exactly."""

    @pytest.mark.parametrize('seed', range(10))
    def test_all_formats_random_options(self, seed):
        import stable_whisper as ref_pkg
        import stable_ts_tpu as our_pkg
        rng = np.random.default_rng(6000 + seed)
        ref, ours = both(8000 + seed, int(rng.integers(2, 6)))
        word_level = bool(rng.integers(2))
        segment_level = bool(rng.integers(2)) or not word_level
        common = dict(segment_level=segment_level, word_level=word_level)
        pairs = [
            ('result_to_srt_vtt', dict(vtt=False, **common)),
            ('result_to_srt_vtt', dict(vtt=True, **common)),
            ('result_to_tsv', dict(word_level=word_level,
                                   segment_level=not word_level)),
            ('result_to_txt', {}),
            ('result_to_ass', dict(karaoke=bool(rng.integers(2)), **common)),
        ]
        for fn_name, kwargs in pairs:
            with warnings.catch_warnings():
                warnings.simplefilter('ignore')
                got_ref = getattr(ref_pkg, fn_name)(ref, filepath=None, **kwargs)
                got_ours = getattr(our_pkg, fn_name)(ours, filepath=None, **kwargs)
            assert got_ours == got_ref, (fn_name, kwargs)


class TestFuzzedAdjustOps:
    """adjust_by_silence / adjust_by_result with randomized inputs."""

    @pytest.mark.parametrize('seed', range(10))
    def test_adjust_by_silence_parity(self, seed):
        rng = np.random.default_rng(9000 + seed)
        ref, ours = both(9100 + seed, int(rng.integers(3, 6)))
        n_sil = int(rng.integers(1, 5))
        edges = np.sort(rng.uniform(0.0, 12.0, n_sil * 2))
        audio = np.zeros(16000 * 13, np.float32)
        # carve silence as LOW-amplitude spans in otherwise loud audio so
        # both packages' silence detectors see identical masks
        audio[:] = 0.5
        for a, b in zip(edges[0::2], edges[1::2]):
            audio[int(a * 16000):int(b * 16000)] = 0.0
        kwargs = dict(min_word_dur=float(rng.choice([0.05, 0.1])),
                      word_level=bool(rng.integers(2)),
                      verbose=False)
        import torch
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            ref.adjust_by_silence(torch.from_numpy(audio), **kwargs)
            ours.adjust_by_silence(audio, **kwargs)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())

    @pytest.mark.parametrize('seed', range(8))
    def test_adjust_by_result_parity(self, seed):
        rng = np.random.default_rng(9500 + seed)
        ref, ours = both(9600 + seed, 4)
        # the op requires the SAME word sequence — the "other" result is the
        # same stream with jittered timings
        data = _random_result_dict(9600 + seed, 4)
        t = 0.0
        for seg in data['segments']:
            for w in seg['words']:
                dur = (w['end'] - w['start']) * float(rng.uniform(0.6, 1.4))
                t += float(rng.uniform(0.0, 0.12))        # monotone warp
                w['start'] = round(t, 3)
                t += max(0.02, dur)
                w['end'] = round(t, 3)
            seg['start'] = seg['words'][0]['start']
            seg['end'] = seg['words'][-1]['end']
        ref_other = RefResult(json.loads(json.dumps(data)))
        ours_other = OurResult(json.loads(json.dumps(data)))
        min_word_dur = float(rng.choice([0.05, 0.2]))
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            ref.adjust_by_result(ref_other, min_word_dur=min_word_dur,
                                 verbose=False)
            ours.adjust_by_result(ours_other, min_word_dur=min_word_dur,
                                  verbose=False)
        assert _norm(ours.segments_to_dicts()) == _norm(ref.segments_to_dicts())
