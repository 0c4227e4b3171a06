"""int8 weight-only quantization: accuracy, size, end-to-end decode parity.

TPU-native counterpart of the reference's dynamic quantization
(stable_whisper/quantization.py:35) — the reference has no tests for it;
these assert the properties that make it usable."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_ts_tpu.models.whisper import (
    decoder_apply, encoder_apply, init_params, tiny_test_dims)
from stable_ts_tpu.models.whisper.quantization import (
    QuantizedArray, dequantize_params, quantize_params, quantize_weight,
    quantized_bytes)


@pytest.fixture(scope='module')
def tiny_model():
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    return dims, params


class TestQuantizeWeight:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32))
        qa = quantize_weight(w, compute_dtype=jnp.float32)
        err = jnp.abs(qa.dequantize() - w)
        # symmetric per-channel: max error <= scale/2 per output channel
        amax = jnp.max(jnp.abs(w), axis=0)
        assert bool((err.max(0) <= amax / 127.0 * 0.5 + 1e-6).all())

    def test_zero_channel_safe(self):
        w = jnp.zeros((8, 4), jnp.float32)
        qa = quantize_weight(w)
        assert bool(jnp.isfinite(qa.dequantize().astype(jnp.float32)).all())

    def test_stacked_layer_axis_scales_per_layer(self):
        rng = np.random.default_rng(1)
        w = np.stack([rng.standard_normal((16, 8)).astype(np.float32),
                      rng.standard_normal((16, 8)).astype(np.float32) * 100])
        qa = quantize_weight(jnp.asarray(w), compute_dtype=jnp.float32)
        assert qa.scale.shape == (2, 1, 8)
        # each layer reconstructs with error relative to ITS OWN magnitude
        deq = np.asarray(qa.dequantize())
        for layer in range(2):
            rel = np.abs(deq[layer] - w[layer]).max() / np.abs(w[layer]).max()
            assert rel < 0.01

    def test_pytree_transparent(self):
        qa = quantize_weight(jnp.ones((4, 4)))
        leaves, treedef = jax.tree.flatten(qa)
        assert len(leaves) == 2
        back = jax.tree.unflatten(treedef, leaves)
        assert isinstance(back, QuantizedArray)
        # survives jit boundaries as an argument
        out = jax.jit(lambda q: q.dequantize().sum())(qa)
        assert bool(jnp.isfinite(out))


class TestQuantizeParams:
    def test_only_linear_weights_quantized(self, tiny_model):
        dims, params = tiny_model
        qparams = quantize_params(params)
        # conv stem + embeddings untouched
        assert not isinstance(qparams['encoder']['conv1']['w'], QuantizedArray)
        assert not isinstance(qparams['decoder']['token_emb'], QuantizedArray)
        # attention + mlp projections quantized (stacked layer leaves)
        blocks = qparams['encoder']['blocks']
        assert isinstance(blocks['attn']['q']['w'], QuantizedArray)
        assert isinstance(blocks['mlp']['fc1']['w'], QuantizedArray)
        # biases never quantized
        assert not isinstance(blocks['attn']['q']['b'], QuantizedArray)

    def test_size_shrinks(self, tiny_model):
        dims, params = tiny_model
        params32 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        qparams = quantize_params(params32)
        orig = sum(leaf.size * 4 for leaf in jax.tree.leaves(params32))
        # the tiny test model is embedding-heavy; real Whisper sizes are
        # linear-dominated and shrink far more
        assert quantized_bytes(qparams) < orig * 0.70

    def test_forward_close_to_fp(self, tiny_model):
        """Quantized encoder+decoder logits stay close to full precision."""
        dims, params = tiny_model
        qparams = quantize_params(params, compute_dtype=jnp.float32)
        rng = np.random.default_rng(2)
        mel = jnp.asarray(rng.standard_normal((1, dims.n_mels, 3000)) * 0.5,
                          jnp.float32)
        tokens = jnp.array([[1, 5, 9]], jnp.int32)

        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        logits, _ = decoder_apply(params['decoder'], tokens, xa, dims.n_text_head)
        xa_q = encoder_apply(qparams['encoder'], mel, dims.n_audio_head)
        logits_q, _ = decoder_apply(qparams['decoder'], tokens, xa_q,
                                    dims.n_text_head)
        # same argmax on a random model is too strict; demand small relative
        # logit error instead
        denom = jnp.abs(logits).max()
        rel = jnp.abs(logits_q - logits).max() / denom
        assert float(rel) < 0.05

    def test_dequantize_params_restores_plain_arrays(self, tiny_model):
        dims, params = tiny_model
        qparams = quantize_params(params)
        plain = dequantize_params(qparams)
        assert not any(isinstance(leaf, QuantizedArray)
                       for leaf in jax.tree.leaves(
                           plain, is_leaf=lambda x: isinstance(x, QuantizedArray)))


class TestEndToEnd:
    def test_quantized_model_transcribes(self):
        from stable_ts_tpu.loaders import load_test_model
        from stable_ts_tpu.models.whisper.quantization import quantize_params
        model = load_test_model()
        model.params = quantize_params(model.params, compute_dtype=jnp.float32)
        rng = np.random.default_rng(3)
        audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        result = model.transcribe(audio, verbose=None)
        assert result is not None  # ran through decode + timing end to end


class TestKVQuantAccuracy:
    """int8 cross-KV changes decode numerics, so the auto-on default for
    medium+ models (decoding.py: n_audio_state >= 1024) must be backed by a
    measured parity check — this is that check, on the synthetic test model
    where the default is off and the option is forced both ways."""

    def test_int8_cross_kv_matches_float_decode(self):
        from stable_ts_tpu.loaders import load_test_model
        audio = (np.random.default_rng(3).standard_normal(16000 * 65)
                 * 0.1).astype(np.float32)
        base = load_test_model().transcribe_batched(
            audio, verbose=None, kv_quant=False)
        quant = load_test_model().transcribe_batched(
            audio, verbose=None, kv_quant=True)
        assert quant.text == base.text
        ts_base = [(w.start, w.end) for s in base.segments for w in s.words]
        ts_quant = [(w.start, w.end) for s in quant.segments for w in s.words]
        assert ts_quant == ts_base

    def test_int4_cross_kv_decodes_end_to_end(self):
        """kv_quant=4 (opt-in packed int4 cross-KV) through the full batched
        pipeline. int4's 15-level grid is NOT expected to reproduce the
        float decode token-for-token on a random-weight model — the pin
        here is that the option runs end to end and stays on the rails
        (ordered, rendered, same windowing)."""
        from stable_ts_tpu.loaders import load_test_model
        audio = (np.random.default_rng(3).standard_normal(16000 * 65)
                 * 0.1).astype(np.float32)
        quant = load_test_model().transcribe_batched(
            audio, verbose=None, kv_quant=4)
        assert quant.segments  # decoded something
        assert quant.to_srt_vtt(word_level=True)
        starts = [w.start for s in quant.segments for w in s.words]
        assert starts == sorted(starts)


class TestSelfKVQuantAccuracy:
    """The row-major int8 self-KV cache is auto-ON with the fused self
    kernel (decoding.py:_use_int8_self_cache) — pin its transcription
    accuracy against the float cache the same way the cross-KV default is
    pinned. CPU runs the fused kernel in interpret mode."""

    def test_int8_self_kv_matches_float_decode(self, monkeypatch):
        from stable_ts_tpu.loaders import load_test_model
        audio = (np.random.default_rng(5).standard_normal(16000 * 35)
                 * 0.1).astype(np.float32)
        monkeypatch.setenv('STABLE_TS_TPU_SELF', 'interpret')
        monkeypatch.setenv('STABLE_TS_TPU_SELFKV', '0')
        base = load_test_model().transcribe_batched(audio, verbose=None)
        monkeypatch.setenv('STABLE_TS_TPU_SELFKV', '1')
        quant = load_test_model().transcribe_batched(audio, verbose=None)
        assert quant.text == base.text
        ts_base = [(w.start, w.end) for s in base.segments for w in s.words]
        ts_quant = [(w.start, w.end)
                    for s in quant.segments for w in s.words]
        assert ts_quant == ts_base


class TestWOQKernel:
    """Pallas int8 weight-streaming matmul (ops/woq_matmul.py) — numerics vs
    the plain dequantized dot, via the interpreter on the CPU mesh."""

    def test_matches_dequantized_dot(self, monkeypatch):
        monkeypatch.setenv('STABLE_TS_TPU_WOQ', 'interpret')
        from stable_ts_tpu.ops.woq_matmul import int8_matmul
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((16, 384)).astype(np.float32))
        qa = quantize_weight(
            jnp.asarray(rng.standard_normal((384, 512)).astype(np.float32)),
            compute_dtype=jnp.float32)
        got = np.asarray(int8_matmul(x, qa.q, qa.scale))
        ref = np.asarray(x @ qa.dequantize())
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_ragged_shapes_padded(self, monkeypatch):
        monkeypatch.setenv('STABLE_TS_TPU_WOQ', 'interpret')
        from stable_ts_tpu.ops.woq_matmul import int8_matmul
        rng = np.random.default_rng(1)
        # M not a multiple of the block, N not a multiple of block_n
        x = jnp.asarray(rng.standard_normal((5, 7, 100)).astype(np.float32))
        qa = quantize_weight(
            jnp.asarray(rng.standard_normal((100, 130)).astype(np.float32)),
            compute_dtype=jnp.float32)
        got = np.asarray(int8_matmul(x, qa.q, qa.scale))
        assert got.shape == (5, 7, 130)
        ref = np.asarray(x.reshape(-1, 100) @ qa.dequantize()).reshape(5, 7, 130)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_linear_routes_through_kernel(self, monkeypatch):
        monkeypatch.setenv('STABLE_TS_TPU_WOQ', 'interpret')
        from stable_ts_tpu.models.whisper.model import linear
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        qa = quantize_weight(
            jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32)),
            compute_dtype=jnp.float32)
        b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
        got = np.asarray(linear(x, qa, b))
        ref = np.asarray(x @ qa.dequantize() + b)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_dynamic_int8_matmul_close(self, monkeypatch):
        """'dyn' mode: int8 activations x int8 weights on the MXU; product
        must stay within dynamic-quantization error of the float result."""
        monkeypatch.setenv('STABLE_TS_TPU_WOQ', 'dyn')
        from stable_ts_tpu.models.whisper.model import linear
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
        qa = quantize_weight(
            jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32)),
            compute_dtype=jnp.float32)
        got = np.asarray(linear(x, qa))
        ref = np.asarray(x @ qa.dequantize())
        denom = np.abs(ref).max()
        assert np.abs(got - ref).max() / denom < 0.02
