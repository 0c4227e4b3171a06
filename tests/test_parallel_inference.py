"""Mesh-sharded inference: WhisperTPU.shard() + dp-sharded batched decode.

Runs on the virtual 8-device CPU mesh (conftest). The sharded model must
produce the same transcription as the unsharded one — XLA collectives only
change placement, not math (up to bf16-invariant f32 reductions).
"""
import numpy as np
import pytest

import jax

from stable_ts_tpu.loaders import load_test_model


@pytest.fixture(scope='module')
def audio():
    rng = np.random.default_rng(21)
    return (rng.standard_normal(16000 * 70) * 0.1).astype(np.float32)


class TestShardedInference:
    def test_shard_builds_mesh_and_places_params(self):
        model = load_test_model()
        model.shard()
        assert model.mesh is not None
        dp, tp = model.mesh.shape['dp'], model.mesh.shape['tp']
        assert dp * tp == len(jax.devices())
        # a tensor-sharded leaf actually spans devices
        leaf = model.params['encoder']['blocks']['attn']['q']['w']
        assert len(leaf.sharding.device_set) > 1

    def test_shard_batch_pads_to_dp(self):
        model = load_test_model()
        model.shard()
        dp = model.mesh.shape['dp']
        if dp == 1:
            pytest.skip('dp=1 on this mesh')
        arr = np.zeros((dp + 1, 4), np.float32)
        out, n = model.shard_batch(arr)
        assert n == dp + 1
        assert out.shape[0] % dp == 0

    def test_sharded_matches_unsharded_transcription(self, audio):
        plain = load_test_model()
        sharded = load_test_model().shard()
        r_plain = plain.transcribe_batched(audio, verbose=None)
        r_shard = sharded.transcribe_batched(audio, verbose=None)
        assert r_plain.text == r_shard.text
        starts_p = [w.start for s in r_plain.segments for w in s.words]
        starts_s = [w.start for s in r_shard.segments for w in s.words]
        assert starts_p == pytest.approx(starts_s, abs=0.021)

    def test_sharded_quantized_model(self, audio):
        import jax.numpy as jnp
        from stable_ts_tpu.models.whisper.quantization import (QuantizedArray,
                                                               quantize_params)
        model = load_test_model()
        model.params = quantize_params(model.params, compute_dtype=jnp.float32)
        # tp=2 divides the test model's 2 heads, so the q/fc weights REALLY
        # tensor-shard (tp=4 would silently fall back to replication and the
        # row-parallel scale-sharding path would go untested)
        model.shard(tp=2)
        qw = model.params['encoder']['blocks']['attn']['q']['w']
        assert isinstance(qw, QuantizedArray)
        assert len(qw.q.sharding.device_set) > 1
        # row-parallel weight: scale has size 1 on the tp-sharded axis and
        # must be replicated there rather than crash device_put
        ow = model.params['encoder']['blocks']['attn']['out']['w']
        assert ow.scale.shape[-2] == 1
        result = model.transcribe_batched(audio[:16000 * 35], verbose=None)
        assert result is not None

    def test_sharded_beam_matches_unsharded(self, audio):
        """Beam rows (windows x beams) must survive the dp row padding —
        the reshapes inside _beam_loop assume contiguous per-window beam
        groups, which shard_batch's padding must not break."""
        plain = load_test_model()
        sharded = load_test_model().shard()
        short = audio[:16000 * 35]
        r_plain = plain.transcribe_batched(short, verbose=None, beam_size=2)
        r_shard = sharded.transcribe_batched(short, verbose=None, beam_size=2)
        assert r_plain.text == r_shard.text
        starts_p = [w.start for s in r_plain.segments for w in s.words]
        starts_s = [w.start for s in r_shard.segments for w in s.words]
        assert starts_p == pytest.approx(starts_s, abs=0.021)

    def test_sharded_tp2_matches_unsharded(self, audio):
        plain = load_test_model()
        sharded = load_test_model().shard(tp=2)
        short = audio[:16000 * 35]
        r_plain = plain.transcribe_batched(short, verbose=None)
        r_shard = sharded.transcribe_batched(short, verbose=None)
        assert r_plain.text == r_shard.text

    def test_sharded_align_words_matches_unsharded(self, audio):
        """The align family shards through the dp axis too (segments are
        embarrassingly parallel): batched align_words on the mesh must
        equal the unsharded run."""
        from stable_ts_tpu.result import WhisperResult
        heads = [(0, 1), (1, 0), (1, 1)]
        short = audio[:16000 * 24]
        segs = [dict(start=4.0 * i, end=4.0 * (i + 1),
                     text=f' word{i} and more{i}') for i in range(6)]
        plain = load_test_model(alignment_heads=heads)
        r_plain = plain.align_words(short, [dict(s) for s in segs],
                                    language='en', verbose=None,
                                    parallel=True)
        sharded = load_test_model(alignment_heads=heads).shard()
        r_shard = sharded.align_words(short, [dict(s) for s in segs],
                                      language='en', verbose=None,
                                      parallel=True)
        assert r_plain.text == r_shard.text
        starts_p = [w.start for s in r_plain.segments for w in s.words]
        starts_s = [w.start for s in r_shard.segments for w in s.words]
        assert starts_p == pytest.approx(starts_s, abs=0.021)

    def test_sharded_align_matches_unsharded(self, audio):
        heads = [(0, 1), (1, 0), (1, 1)]
        short = audio[:16000 * 12]
        text = ' hello world this is a mesh test'
        plain = load_test_model(alignment_heads=heads)
        r_plain = plain.align(short, text, language='en', verbose=None)
        sharded = load_test_model(alignment_heads=heads).shard()
        r_shard = sharded.align(short, text, language='en', verbose=None)
        assert r_plain is not None and r_shard is not None
        assert r_plain.text == r_shard.text
        starts_p = [w.start for s in r_plain.segments for w in s.words]
        starts_s = [w.start for s in r_shard.segments for w in s.words]
        assert starts_p == pytest.approx(starts_s, abs=0.021)

    def test_sharded_refine_matches_unsharded(self, audio):
        heads = [(0, 1), (1, 0), (1, 1)]
        short = audio[:16000 * 12]
        text = ' hello world refine me'
        plain = load_test_model(alignment_heads=heads)
        base_p = plain.align(short, text, language='en', verbose=None)
        r_plain = plain.refine(short, base_p, inplace=False, parallel=True,
                               verbose=None)
        sharded = load_test_model(alignment_heads=heads).shard()
        base_s = sharded.align(short, text, language='en', verbose=None)
        r_shard = sharded.refine(short, base_s, inplace=False, parallel=True,
                                 verbose=None)
        starts_p = [w.start for s in r_plain.segments for w in s.words]
        starts_s = [w.start for s in r_shard.segments for w in s.words]
        assert starts_p == pytest.approx(starts_s, abs=0.021)
