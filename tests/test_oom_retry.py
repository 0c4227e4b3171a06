"""Graceful OOM handling in the batched driver (VERDICT r4 weak #6):
a RESOURCE_EXHAUSTED from the device halves the window batch and retries
with a warning instead of crashing mid-file, and an over-capacity
batch_size request is capped by the analytic HBM budget up front.
"""
import warnings

import numpy as np
import pytest

from stable_ts_tpu.batched import _hbm_batch_cap, transcribe_batched
from stable_ts_tpu.loaders import load_test_model


class FakeOOM(Exception):
    """Mimics jaxlib's XlaRuntimeError message shape."""

    def __str__(self):
        return ('RESOURCE_EXHAUSTED: Error allocating device buffer: '
                'attempting to allocate 7.90G')


@pytest.fixture(scope='module')
def model():
    return load_test_model()


def _audio(seconds=35.0, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * 0.2
            ).astype(np.float32)


class TestOOMRetry:
    def test_halves_and_completes(self, model):
        audio = _audio()
        seen_batches = []
        orig = model.decode_launch

        def flaky_launch(features, options, **kw):
            seen_batches.append(int(features.shape[0]))
            if features.shape[0] > 2:
                raise FakeOOM()
            return orig(features, options, **kw)

        model.decode_launch = flaky_launch
        try:
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter('always')
                result = transcribe_batched(model, audio, batch_size=8,
                                            language='en', verbose=None)
        finally:
            model.decode_launch = orig
        assert result.has_words
        # 8 -> OOM -> 4 -> OOM -> 2 -> completes
        assert seen_batches[0] == 8 and 2 in seen_batches
        msgs = [str(w.message) for w in caught]
        assert any('retrying transcription with batch_size=4' in m
                   for m in msgs)
        assert any('batch_size=2' in m for m in msgs)

    def test_non_oom_errors_propagate(self, model):
        audio = _audio()
        orig = model.decode_launch

        def broken_launch(features, options, **kw):
            raise ValueError('unrelated failure')

        model.decode_launch = broken_launch
        try:
            with pytest.raises(ValueError, match='unrelated failure'):
                transcribe_batched(model, audio, batch_size=4,
                                   language='en', verbose=None)
        finally:
            model.decode_launch = orig

    def test_oom_at_batch_one_reraises(self, model):
        audio = _audio()
        orig = model.decode_launch

        def always_oom(features, options, **kw):
            raise FakeOOM()

        model.decode_launch = always_oom
        try:
            with pytest.raises(FakeOOM):
                transcribe_batched(model, audio, batch_size=2,
                                   language='en', verbose=None)
        finally:
            model.decode_launch = orig


class TestCapacityCap:
    def test_large_v3_cap_blocks_b64(self):
        """The r4-measured OOM point (b64, large-v3, bf16) must be above
        the analytic cap; the measured-good b32 must be below it."""
        import types

        class Dims:
            n_text_layer = 32
            n_text_state = 1280
            n_audio_state = 1280
            n_text_ctx = 448

        fake = types.SimpleNamespace(
            dims=Dims(),
            params={'w': np.zeros((800_000_000, 2), np.uint16)})  # 3.2 GB
        cap = _hbm_batch_cap(fake)
        assert 32 <= cap < 64

    def test_cap_warns_and_degrades(self, model):
        audio = _audio(seconds=20.0)
        import stable_ts_tpu.batched as bm
        orig = bm._hbm_batch_cap
        bm._hbm_batch_cap = lambda m, beam=1: 2
        try:
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter('always')
                result = transcribe_batched(model, audio, batch_size=16,
                                            language='en', verbose=None)
        finally:
            bm._hbm_batch_cap = orig
        assert result is not None
        assert any('exceeds the estimated HBM capacity' in str(w.message)
                   for w in caught)

    def test_modelless_backend_uncapped(self):
        assert _hbm_batch_cap(object()) is None
