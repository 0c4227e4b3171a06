"""tools/validate_real.py mechanics on a synthetic checkpoint.

Real-weight accuracy is unverifiable offline (PARITY.md); this only proves
the harness runs: loads a checkpoint, transcribes, evaluates invariants, and
reports the reference package as unavailable with a nonzero exit.
"""
import os
import subprocess
import sys
import wave

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, 'tools', 'validate_real.py')


@pytest.fixture(scope='module')
def synthetic_ckpt(tmp_path_factory):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from stable_ts_tpu.models.whisper.load import save_openai_checkpoint
    from stable_ts_tpu.models.whisper.model import tiny_test_dims, init_params
    d = tmp_path_factory.mktemp('ckpt')
    dims = tiny_test_dims()
    path = str(d / 'synthetic.pt')
    save_openai_checkpoint(path, dims, init_params(dims, seed=0))
    return path


@pytest.fixture(scope='module')
def tone_wav(tmp_path_factory):
    d = tmp_path_factory.mktemp('audio')
    path = str(d / 'tone.wav')
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000 * 3) * 0.1 * 32767).astype('<i2')
    with wave.open(path, 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return path


def test_harness_runs_and_reports_reference_unavailable(synthetic_ckpt, tone_wav):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run([sys.executable, SCRIPT, synthetic_ckpt, tone_wav],
                          capture_output=True, text=True, timeout=900, env=env)
    out = proc.stdout + proc.stderr
    assert 'transcribing' in out
    # random weights cannot satisfy the golden invariants...
    assert 'INVARIANT FAIL' in out
    # ...and the reference package is absent in this environment
    assert 'stable_whisper package unavailable' in out
    assert proc.returncode == 1


def test_missing_paths_exit_cleanly():
    proc = subprocess.run([sys.executable, SCRIPT, '/no/such.pt'],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert 'checkpoint not found' in proc.stderr + proc.stdout
