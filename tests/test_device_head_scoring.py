"""Device-side head scoring for the batched timing pass (VERDICT r2 #4):
the masked on-device scorers must reproduce the host (crop-based) scorers
exactly on full windows, including with padded token rows."""
import numpy as np
import pytest

import jax.numpy as jnp

from stable_ts_tpu.models.whisper.timing import (
    _dynamic_head_weights, _new_aligner_matrix_host, dynamic_weights_device,
    new_aligner_matrix_device)


@pytest.fixture()
def qks():
    rng = np.random.default_rng(11)
    L, H, T, F = 3, 4, 24, 96
    return rng.standard_normal((L, H, T, F)).astype(np.float32) * 2


SOT = 3


def _crop(qks, row_count):
    # host path receives rows cropped to sot + no_ts + text + eot
    return qks[:, :, :SOT + row_count + 1]


@pytest.mark.parametrize('row_count', [20, 12])
def test_dynamic_device_matches_host(qks, row_count):
    L, H, T, F = qks.shape
    host_w = _dynamic_head_weights(_crop(qks, row_count), SOT, F, 1.0, 7, 5,
                                   None)
    host = host_w.mean(axis=0)
    dev = np.asarray(dynamic_weights_device(
        jnp.asarray(qks), jnp.int32(F), jnp.int32(row_count), None, SOT,
        1.0, medfilt_width=7, heads_count=5))
    np.testing.assert_allclose(dev[:row_count], host[:row_count],
                               rtol=1e-4, atol=1e-5)


def test_dynamic_device_matches_host_with_peaks(qks):
    L, H, T, F = qks.shape
    row_count = 16
    jumps = np.sort(np.random.default_rng(1).integers(0, F, row_count))
    host_w = _dynamic_head_weights(_crop(qks, row_count), SOT, F, 1.0, 7, 5,
                                   jumps)
    host = host_w.mean(axis=0)
    ji = np.pad(jumps, (0, 1), constant_values=F)
    peaks = np.zeros(T - SOT - 1, np.float32)
    peaks[:row_count] = ji[:-1] + (ji[1:] - ji[:-1]) * 0.5
    dev = np.asarray(dynamic_weights_device(
        jnp.asarray(qks), jnp.int32(F), jnp.int32(row_count),
        jnp.asarray(peaks), SOT, 1.0, medfilt_width=7, heads_count=5))
    np.testing.assert_allclose(dev[:row_count], host[:row_count],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('row_count', [20, 12])
def test_new_aligner_device_matches_host(qks, row_count):
    L, H, T, F = qks.shape
    host = _new_aligner_matrix_host(_crop(qks, row_count), F, SOT, 1.0, 7,
                                    topk=6, w_colnorm=1.0, w_rownorm=1.0,
                                    w_coverage=0.5)
    dev = np.asarray(new_aligner_matrix_device(
        jnp.asarray(qks), jnp.int32(F), jnp.int32(row_count), SOT,
        1.0, medfilt_width=7, topk=6, w_colnorm=1.0, w_rownorm=1.0,
        w_coverage=0.5))
    np.testing.assert_allclose(dev[:row_count], host[:row_count],
                               rtol=1e-4, atol=1e-5)


def test_batched_transcribe_dynamic_and_new_run(tmp_path):
    """End-to-end: the batched driver's device-scored modes produce words."""
    from stable_ts_tpu.constants import SAMPLE_RATE
    from stable_ts_tpu.loaders import load_test_model
    model = load_test_model()
    t = np.arange(SAMPLE_RATE * 70) / SAMPLE_RATE
    audio = (np.sin(2 * np.pi * 320 * t)
             * (0.3 + 0.2 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    for kwargs in (dict(dynamic_heads=True), dict(dynamic_heads='4,2'),
                   dict(aligner='new')):
        res = model.transcribe_batched(audio, batch_size=2, language='en',
                                       verbose=None, temperature=0.0,
                                       **kwargs)
        assert any(s.words for s in res.segments), kwargs
