"""Canonical alignment-heads table: decode validity + loader wiring."""
import numpy as np
import pytest

from stable_ts_tpu.models.whisper.alignment_heads import (
    get_alignment_heads, model_names, resolve_model_name)
from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS


class TestTable:
    @pytest.mark.parametrize('name', model_names())
    def test_blob_decodes_to_model_shape(self, name):
        dims = OPENAI_MODEL_DIMS[name]
        heads = get_alignment_heads(name, dims['n_text_layer'],
                                    dims['n_text_head'])
        assert heads, name
        for layer, head in heads:
            assert 0 <= layer < dims['n_text_layer']
            assert 0 <= head < dims['n_text_head']
        # alignment heads live in the mid-to-late decoder layers
        assert max(layer for layer, _ in heads) >= dims['n_text_layer'] // 4

    def test_known_values_large_v3(self):
        """Spot-check against whisper's published large-v3 mask."""
        heads = get_alignment_heads('large-v3', 32, 20)
        assert len(heads) == 10
        assert heads[0] == (7, 0)

    def test_shape_mismatch_returns_none(self):
        assert get_alignment_heads('large-v3', 4, 6) is None

    def test_unknown_name_returns_none(self):
        assert get_alignment_heads('my-finetune', 4, 6) is None


class TestResolution:
    def test_resolves_bare_names_and_paths(self):
        assert resolve_model_name('large-v3') == 'large-v3'
        assert resolve_model_name('/models/medium.en.pt') == 'medium.en'
        assert resolve_model_name('turbo') == 'turbo'
        assert resolve_model_name('whatever.pt') is None

    def test_loader_attaches_default_heads(self, tmp_path):
        """An OpenAI checkpoint saved under a canonical name gets the
        canonical heads by default; alignment_heads=... still overrides."""
        from stable_ts_tpu.loaders import load_model
        from stable_ts_tpu.models.whisper.load import save_openai_checkpoint
        from stable_ts_tpu.models.whisper.model import (ModelDimensions,
                                                        init_params)
        dims = ModelDimensions(**OPENAI_MODEL_DIMS['tiny.en'])
        params = init_params(dims, seed=0)
        path = str(tmp_path / 'tiny.en.pt')
        save_openai_checkpoint(path, dims, params)
        # fake English rank table: 256 byte ranks + dummy fillers to 50256
        import base64 as b64
        ranks = {bytes([b]): b for b in range(256)}
        i = 256
        while len(ranks) < 50256:
            ranks[b'\x00' + i.to_bytes(3, 'big')] = i
            i += 1
        vocab = tmp_path / 'gpt2.tiktoken'
        with open(vocab, 'wb') as f:
            for token, rank in ranks.items():
                f.write(b64.b64encode(token) + b' %d\n' % rank)
        model = load_model(path, vocab_path=str(vocab))
        expected = get_alignment_heads('tiny.en', dims.n_text_layer,
                                       dims.n_text_head)
        assert model.alignment_heads == expected
        override = [(0, 0)]
        model2 = load_model(path, vocab_path=str(vocab),
                            alignment_heads=override)
        assert model2.alignment_heads == override
