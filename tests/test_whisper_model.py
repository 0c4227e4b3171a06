"""Model tests: shapes, KV-cache consistency, checkpoint round-trips, tokenizer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_ts_tpu.models.whisper import (
    ModelDimensions, encoder_apply, decoder_apply, decoder_step,
    precompute_cross_kv, init_kv_cache, init_params, tiny_test_dims,
    get_tokenizer, save_openai_checkpoint, load_openai_checkpoint,
)
from stable_ts_tpu.models.whisper.load import hf_key_to_openai, OPENAI_MODEL_DIMS
from stable_ts_tpu.ops import log_mel_spectrogram


@pytest.fixture(scope='module')
def tiny_model():
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    return dims, params


@pytest.fixture(scope='module')
def mel_window():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    mel = log_mel_spectrogram(audio, padding=16000 * 28)
    return jnp.asarray(mel)[None]  # (1, 80, 3000)


class TestEncoder:
    def test_output_shape(self, tiny_model, mel_window):
        dims, params = tiny_model
        out = encoder_apply(params['encoder'], mel_window, dims.n_audio_head)
        assert out.shape == (1, dims.n_audio_ctx, dims.n_audio_state)
        assert bool(jnp.isfinite(out).all())

    def test_batched(self, tiny_model, mel_window):
        dims, params = tiny_model
        batch = jnp.concatenate([mel_window, mel_window * 0.5], axis=0)
        out = encoder_apply(params['encoder'], batch, dims.n_audio_head)
        assert out.shape == (2, dims.n_audio_ctx, dims.n_audio_state)


class TestDecoder:
    def test_logits_shape_and_qk(self, tiny_model, mel_window):
        dims, params = tiny_model
        xa = encoder_apply(params['encoder'], mel_window, dims.n_audio_head)
        tokens = jnp.array([[1, 2, 3, 4, 5]], dtype=jnp.int32)
        logits, qks = decoder_apply(params['decoder'], tokens, xa,
                                    dims.n_text_head, capture_qk=True)
        assert logits.shape == (1, 5, dims.n_vocab)
        assert qks.shape == (dims.n_text_layer, 1, dims.n_text_head, 5,
                             dims.n_audio_ctx)

    def test_causality(self, tiny_model, mel_window):
        """Changing a later token must not affect earlier logits."""
        dims, params = tiny_model
        xa = encoder_apply(params['encoder'], mel_window, dims.n_audio_head)
        t1 = jnp.array([[1, 2, 3, 4, 5]], dtype=jnp.int32)
        t2 = jnp.array([[1, 2, 3, 9, 9]], dtype=jnp.int32)
        l1, _ = decoder_apply(params['decoder'], t1, xa, dims.n_text_head)
        l2, _ = decoder_apply(params['decoder'], t2, xa, dims.n_text_head)
        np.testing.assert_allclose(np.asarray(l1[:, :3]), np.asarray(l2[:, :3]),
                                   atol=1e-5)

    def test_kv_cache_matches_teacher_forced(self, tiny_model, mel_window):
        """Incremental decode_step must reproduce the full forward exactly."""
        dims, params = tiny_model
        xa = encoder_apply(params['encoder'], mel_window, dims.n_audio_head)
        tokens = jnp.array([[7, 11, 13, 17, 19, 23]], dtype=jnp.int32)
        full_logits, _ = decoder_apply(params['decoder'], tokens, xa,
                                       dims.n_text_head)

        cross_kv = precompute_cross_kv(params['decoder'], xa)
        cache = init_kv_cache(dims, batch=1)
        step_logits = []
        for pos in range(tokens.shape[1]):
            logits, cache = decoder_step(
                params['decoder'], tokens[:, pos:pos + 1], jnp.int32(pos),
                cross_kv, cache, dims.n_text_head)
            step_logits.append(np.asarray(logits))
        step_logits = np.stack(step_logits, axis=1)
        np.testing.assert_allclose(step_logits, np.asarray(full_logits),
                                   rtol=2e-4, atol=2e-4)


    def test_padded_prefill_then_step_matches_full(self, tiny_model,
                                                   mel_window):
        """The locate() confirmation-decode invariant: a prefix prefilled
        with junk right-padding (cache slots past the real length hold
        garbage K/V) must yield the same logits at the last real position,
        and a subsequent decoder_step appending one token must match the
        full teacher-forced forward — junk slots are masked, and the step
        overwrites its own slot before attending (alignment.py:
        greedy_confirm)."""
        from stable_ts_tpu.models.whisper.model import (decoder_prefill,
                                                        fuse_self_qkv)
        dims, params = tiny_model
        xa = encoder_apply(params['encoder'], mel_window, dims.n_audio_head)
        seq = [7, 11, 13, 17, 19, 23, 29]
        n = 5
        cache_len = 16
        junk = 3  # any in-vocab id; its K/V must never leak into outputs
        full_logits, _ = decoder_apply(
            params['decoder'], jnp.asarray([seq], jnp.int32), xa,
            dims.n_text_head)

        padded = seq[:n] + [junk] * (8 - n)  # bucket-of-8 right padding
        pre_logits, kv = decoder_prefill(
            params['decoder'], jnp.asarray([padded], jnp.int32), xa,
            dims.n_text_head, cache_len)
        np.testing.assert_allclose(
            np.asarray(pre_logits[0, n - 1]), np.asarray(full_logits[0, n - 1]),
            rtol=2e-4, atol=2e-4)

        dec = dict(params['decoder'])
        dec['blocks'] = fuse_self_qkv(dec['blocks'])
        cross_kv = precompute_cross_kv(params['decoder'], xa)
        step_logits, kv = decoder_step(
            dec, jnp.asarray([[seq[n]]], jnp.int32), jnp.int32(n),
            cross_kv, kv, dims.n_text_head)
        np.testing.assert_allclose(
            np.asarray(step_logits[0]), np.asarray(full_logits[0, n]),
            rtol=2e-4, atol=2e-4)


class TestCheckpointRoundTrip:
    def test_openai_pt_roundtrip(self, tiny_model, mel_window, tmp_path):
        dims, params = tiny_model
        path = str(tmp_path / 'tiny_synthetic.pt')
        save_openai_checkpoint(path, dims, params)
        dims2, params2 = load_openai_checkpoint(path)
        assert dims2 == dims
        out1 = encoder_apply(params['encoder'], mel_window, dims.n_audio_head)
        out2 = encoder_apply(
            jax.tree.map(jnp.asarray, params2['encoder']), mel_window,
            dims.n_audio_head)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)

    def test_hf_key_remap(self):
        cases = {
            'model.encoder.layers.3.self_attn.q_proj.weight':
                'encoder.blocks.3.attn.query.weight',
            'model.decoder.layers.0.encoder_attn.k_proj.weight':
                'decoder.blocks.0.cross_attn.key.weight',
            'model.decoder.layers.2.fc1.bias': 'decoder.blocks.2.mlp.0.bias',
            'model.decoder.embed_tokens.weight': 'decoder.token_embedding.weight',
            'model.decoder.embed_positions.weight': 'decoder.positional_embedding',
            'model.encoder.layer_norm.weight': 'encoder.ln_post.weight',
            'model.decoder.layer_norm.bias': 'decoder.ln.bias',
            'model.decoder.layers.1.final_layer_norm.weight':
                'decoder.blocks.1.mlp_ln.weight',
            'model.decoder.layers.1.self_attn_layer_norm.weight':
                'decoder.blocks.1.attn_ln.weight',
            'model.decoder.layers.1.encoder_attn_layer_norm.weight':
                'decoder.blocks.1.cross_attn_ln.weight',
        }
        for hf, expected in cases.items():
            assert hf_key_to_openai(hf) == expected

    def test_decode_without_language_detects(self):
        """Direct decode() on a multilingual model with no language must run
        language detection (whisper's DecodingTask behavior), not silently
        assume English."""
        from stable_ts_tpu.loaders import WhisperTPU
        from stable_ts_tpu.models.whisper.model import tiny_test_dims
        ranks = {bytes([b]): b for b in range(256)}
        i = 256
        while len(ranks) < 50257:
            ranks[b'\x00' + i.to_bytes(3, 'big')] = i
            i += 1
        dims = tiny_test_dims(n_vocab=51866)
        model = WhisperTPU(dims, init_params(dims, seed=1), ranks=ranks)
        assert model.is_multilingual
        rng = np.random.default_rng(2)
        audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        mel = np.asarray(log_mel_spectrogram(audio, padding=16000 * 28))
        res = model.decode(mel[..., :3000])
        from stable_ts_tpu.models.whisper.languages import LANGUAGES
        assert res[0].language in LANGUAGES

    def test_model_catalog(self):
        dims = ModelDimensions(**OPENAI_MODEL_DIMS['large-v3'])
        assert dims.is_multilingual
        assert dims.num_languages == 100
        dims_en = ModelDimensions(**OPENAI_MODEL_DIMS['tiny.en'])
        assert not dims_en.is_multilingual
        assert ModelDimensions(**OPENAI_MODEL_DIMS['tiny']).num_languages == 99


class TestTokenizer:
    def test_synthetic_layout_ids(self):
        tok = get_tokenizer(multilingual=True, language='en', task='transcribe')
        assert tok.eot == 256
        assert tok.sot == 257
        assert tok.timestamp_begin == 256 + 2 + 99 + 6
        assert tok.n_vocab == 256 + 2 + 99 + 6 + 1501
        assert tok.sot_sequence == (tok.sot, tok.to_language_token('en'),
                                    tok.transcribe)

    def test_real_multilingual_ids_with_fake_ranks(self):
        # Simulate the real multilingual vocab size (50257 base ranks).
        from stable_ts_tpu.models.whisper.tokenizer import WhisperTokenizer
        ranks = {bytes([b]): b for b in range(256)}
        # pad rank table to 50257 entries with dummy multi-byte tokens
        i = 256
        while len(ranks) < 50257:
            ranks[b'\x00' + i.to_bytes(3, 'big')] = i
            i += 1
        tok = WhisperTokenizer(ranks, multilingual=True, num_languages=99)
        assert tok.eot == 50257
        assert tok.sot == 50258
        assert tok.timestamp_begin == 50364
        assert tok.n_vocab == 51865
        tok100 = WhisperTokenizer(ranks, multilingual=True, num_languages=100)
        assert tok100.timestamp_begin == 50365
        assert tok100.n_vocab == 51866

    def test_encode_decode_roundtrip(self):
        tok = get_tokenizer(language='en')
        for text in [' Hello world.', " It's 3.14!", ' café — über']:
            ids = tok.encode(text)
            assert tok.decode(ids) == text

    def test_bpe_merges_apply(self):
        from stable_ts_tpu.models.whisper.tokenizer import (ByteLevelBPE,
                                                            synthetic_byte_ranks)
        ranks = synthetic_byte_ranks([b'th', b'the', b' the'])
        bpe = ByteLevelBPE(ranks)
        ids = bpe.encode(' the cat')
        assert ranks[b' the'] in ids
        assert bpe.decode(ids) == ' the cat'

    def test_decode_with_timestamps(self):
        tok = get_tokenizer(language='en')
        ids = [tok.timestamp_begin] + tok.encode(' hi') + [tok.timestamp_begin + 50]
        s = tok.decode_with_timestamps(ids)
        assert s == '<|0.00|> hi<|1.00|>'

    def test_split_tokens_on_spaces(self):
        tok = get_tokenizer(language='en')
        ids = tok.encode(' Hello world, how are you?')
        words, word_tokens = tok.split_tokens_on_spaces(ids)
        # Punctuation splits into its own entry at this stage (matching
        # Whisper); merge_punctuations joins it to words later.
        assert words == [' Hello', ' world', ',', ' how', ' are', ' you', '?']
        assert sum(word_tokens, []) == ids

    def test_timestamp_tokens_format(self):
        tok = get_tokenizer(language='en')
        assert tok.special_tokens['<|0.02|>'] == tok.timestamp_begin + 1
        assert tok.special_tokens['<|30.00|>'] == tok.timestamp_begin + 1500

    def test_non_speech_tokens(self):
        tok = get_tokenizer(language='en')
        ns = tok.non_speech_tokens
        assert len(ns) > 0
        assert all(t < tok.eot for t in ns)


class TestHFDirectoryLoad:
    """End-to-end HF safetensors directory loading (not just key remap)."""

    @staticmethod
    def _openai_to_hf_key(key: str) -> str:
        # order matters: the *_ln fragments contain the attn fragments
        pairs = [
            ('mlp_ln', 'final_layer_norm'),
            ('cross_attn_ln', 'encoder_attn_layer_norm'),
            ('attn_ln', 'self_attn_layer_norm'),
            ('cross_attn', 'encoder_attn'),
            ('attn', 'self_attn'),
            ('mlp.0', 'fc1'), ('mlp.2', 'fc2'),
            ('query', 'q_proj'), ('key', 'k_proj'), ('value', 'v_proj'),
            ('out', 'out_proj'),
            ('blocks', 'layers'),
            ('positional_embedding', 'embed_positions.weight'),
            ('token_embedding', 'embed_tokens'),
            ('encoder.ln_post', 'encoder.layer_norm'),
            ('decoder.ln', 'decoder.layer_norm'),
        ]
        for old, new in pairs:
            key = key.replace(old, new)
        return 'model.' + key

    def test_hf_dir_roundtrip(self, tmp_path, mel_window):
        import torch
        from safetensors.numpy import save_file
        from stable_ts_tpu.models.whisper.load import (load_hf_checkpoint,
                                                       save_openai_checkpoint,
                                                       load_openai_checkpoint)

        dims = tiny_test_dims()
        params = init_params(dims, seed=3)
        pt_path = str(tmp_path / 'tiny.pt')
        save_openai_checkpoint(pt_path, dims, params)
        sd = torch.load(pt_path, map_location='cpu',
                        weights_only=False)['model_state_dict']

        # fabricate the HF directory
        hf_sd = {}
        for k, v in sd.items():
            hf_key = self._openai_to_hf_key(k)
            assert hf_key_to_openai(hf_key) == k, (k, hf_key)  # self-check
            hf_sd[hf_key] = np.asarray(v)
        save_file(hf_sd, str(tmp_path / 'model.safetensors'))
        import json as _json
        with open(tmp_path / 'config.json', 'w') as f:
            _json.dump(dict(
                num_mel_bins=dims.n_mels,
                max_source_positions=dims.n_audio_ctx,
                d_model=dims.n_audio_state,
                encoder_attention_heads=dims.n_audio_head,
                encoder_layers=dims.n_audio_layer,
                vocab_size=dims.n_vocab,
                max_target_positions=dims.n_text_ctx,
                decoder_attention_heads=dims.n_text_head,
                decoder_layers=dims.n_text_layer,
            ), f)

        hf_dims, hf_params = load_hf_checkpoint(str(tmp_path))
        assert hf_dims == dims
        # forward parity: identical logits from both loaders
        _, pt_params = load_openai_checkpoint(pt_path)
        xa1 = encoder_apply(pt_params['encoder'], mel_window, dims.n_audio_head)
        xa2 = encoder_apply(hf_params['encoder'], mel_window, dims.n_audio_head)
        assert np.allclose(np.asarray(xa1), np.asarray(xa2), atol=1e-5)
        toks = jnp.array([[1, 2, 3]], jnp.int32)
        l1, _ = decoder_apply(pt_params['decoder'], toks, xa1, dims.n_text_head)
        l2, _ = decoder_apply(hf_params['decoder'], toks, xa2, dims.n_text_head)
        assert np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


class TestFusedQKV:
    """fuse_self_qkv (model.py): fused projection must reproduce the three
    separate q/k/v projections exactly."""

    def test_float_weights_bit_identical(self):
        from stable_ts_tpu.models.whisper.model import (fuse_self_qkv,
                                                        init_params,
                                                        linear,
                                                        tiny_test_dims)
        import jax.numpy as jnp
        dims = tiny_test_dims()
        params = init_params(dims, seed=0)
        blocks = params['decoder']['blocks']
        fused = fuse_self_qkv(blocks)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(
            (2, 3, dims.n_text_state)).astype(np.float32))
        # layer 0 slices
        l0 = jax.tree.map(lambda t: t[0], blocks)
        f0 = jax.tree.map(lambda t: t[0], fused)
        qkv = linear(x, f0['qkv']['w'], f0['qkv']['b'])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q_ref = linear(x, l0['attn']['q']['w'], l0['attn']['q']['b'])
        k_ref = linear(x, l0['attn']['k']['w'])
        v_ref = linear(x, l0['attn']['v']['w'], l0['attn']['v']['b'])
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
        np.testing.assert_array_equal(np.asarray(k), np.asarray(k_ref))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))

    def test_quantized_weights_concat_exactly(self):
        from stable_ts_tpu.models.whisper.model import (fuse_self_qkv,
                                                        init_params,
                                                        tiny_test_dims)
        from stable_ts_tpu.models.whisper.quantization import (
            QuantizedArray, quantize_params)
        dims = tiny_test_dims()
        params = quantize_params(init_params(dims, seed=0))
        fused = fuse_self_qkv(params['decoder']['blocks'])
        w = fused['qkv']['w']
        assert isinstance(w, QuantizedArray)
        attn = params['decoder']['blocks']['attn']
        d = dims.n_text_state
        np.testing.assert_array_equal(np.asarray(w.q[..., :d]),
                                      np.asarray(attn['q']['w'].q))
        np.testing.assert_array_equal(np.asarray(w.scale[..., d:2 * d]),
                                      np.asarray(attn['k']['w'].scale))


def test_shard_disables_fused_kernels():
    """A >1-device mesh must trip the process-wide Pallas kernel gate
    (loaders.py: shard)."""
    from stable_ts_tpu.loaders import load_test_model
    from stable_ts_tpu.models.whisper import model as model_mod
    model_mod.set_fused_kernels_enabled(True)
    try:
        m = load_test_model()
        m.shard(tp=2)
        assert not model_mod.fused_kernels_enabled()
    finally:
        model_mod.set_fused_kernels_enabled(True)
