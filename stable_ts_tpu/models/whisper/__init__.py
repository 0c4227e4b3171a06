"""Pure-JAX Whisper: model, tokenizer, checkpoint loading, decoding, timing."""
from .model import (ModelDimensions, encoder_apply, decoder_apply, decoder_step,
                    precompute_cross_kv, init_kv_cache, init_params, tiny_test_dims)
from .tokenizer import WhisperTokenizer, get_tokenizer
from .load import (OPENAI_MODEL_DIMS, load_openai_checkpoint, load_hf_checkpoint,
                   save_openai_checkpoint)
from .languages import LANGUAGES, LANGUAGES_V3, TO_LANGUAGE_CODE, get_valid_language

__all__ = [
    'ModelDimensions', 'encoder_apply', 'decoder_apply', 'decoder_step',
    'precompute_cross_kv', 'init_kv_cache', 'init_params', 'tiny_test_dims',
    'WhisperTokenizer', 'get_tokenizer', 'OPENAI_MODEL_DIMS',
    'load_openai_checkpoint', 'load_hf_checkpoint', 'save_openai_checkpoint',
    'LANGUAGES', 'LANGUAGES_V3', 'TO_LANGUAGE_CODE', 'get_valid_language',
]
