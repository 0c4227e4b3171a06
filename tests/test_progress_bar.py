"""The reference shows a tqdm progress bar by default (verbose=False)
during transcribe/align/refine (original_whisper.py:444,
non_whisper/alignment.py:286, refinement.py:181). Pin the same display
rule here: bar on stderr when verbose is exactly False, silent for None.
"""
import numpy as np
import pytest

from stable_ts_tpu.loaders import load_test_model


@pytest.fixture(scope='module')
def model():
    return load_test_model()


def _audio(seconds=35.0):
    rng = np.random.default_rng(0)
    return (rng.standard_normal(int(16000 * seconds)) * 0.2
            ).astype(np.float32)


def _stderr_of(capfd):
    return capfd.readouterr().err


class TestProgressBar:
    def test_transcribe_batched_shows_bar(self, model, capfd):
        model.transcribe_batched(_audio(), language='en', verbose=False)
        err = _stderr_of(capfd)
        assert 'Transcribe' in err and '%|' in err

    def test_transcribe_batched_silent_when_none(self, model, capfd):
        model.transcribe_batched(_audio(), language='en', verbose=None)
        assert '%|' not in _stderr_of(capfd)

    def test_sequential_transcribe_shows_bar(self, model, capfd):
        model.transcribe(_audio(), language='en', verbose=False)
        err = _stderr_of(capfd)
        assert 'Transcribe' in err and '100%' in err

    def test_align_shows_bar(self, model, capfd):
        model.align(_audio(), 'w01 w02 w03 w04', language='en',
                    verbose=False)
        err = _stderr_of(capfd)
        assert 'Align' in err and '%|' in err

    def test_refine_shows_bar(self, model, capfd):
        audio = _audio()
        base = model.transcribe_batched(audio, language='en', verbose=None)
        _stderr_of(capfd)
        model.refine(audio, base, inplace=False, verbose=False)
        err = _stderr_of(capfd)
        assert 'Refine' in err and '%|' in err
