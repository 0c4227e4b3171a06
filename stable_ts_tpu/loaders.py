"""Model loading and the user-facing model wrapper.

Counterpart of the reference's ``load_model`` + ``modify_model`` monkey-patch
pattern (whisper_word_level/original_whisper.py:931-1008). JAX is functional,
so instead of patching methods onto a foreign model instance, ``WhisperTPU``
is a thin wrapper owning (dims, params, tokenizer factory) and exposing
``transcribe / align / align_words / refine / locate / decode``.
"""
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .models.whisper.load import (OPENAI_MODEL_DIMS, load_hf_checkpoint,
                                  load_openai_checkpoint)
from .models.whisper.model import ModelDimensions, encoder_apply, init_params
from .models.whisper.tokenizer import WhisperTokenizer, get_tokenizer
from .models.whisper.decoding import (DecodingOptions, decode as _decode,
                                      decode_collect as _decode_collect,
                                      decode_launch as _decode_launch,
                                      detect_language)

_VOCAB_CANDIDATES = ('multilingual.tiktoken', 'gpt2.tiktoken', 'vocab.json')


class WhisperTPU:
    """A Whisper model on TPU: params + pure apply fns + task methods."""

    def __init__(self, dims: ModelDimensions, params, *,
                 name: str = 'custom',
                 vocab_path: Optional[str] = None,
                 ranks: Optional[dict] = None,
                 alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
                 dtype=None, dq: bool = False):
        import jax
        import jax.numpy as jnp
        if dtype is not None:
            params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        else:
            params = jax.tree.map(jnp.asarray, params)
        if dq:
            # int8 weight-only quantization of the linear projections
            # (TPU-native counterpart of the reference's ptdq_linear,
            # quantization.py:35). compute dtype = requested dtype or bf16.
            from .models.whisper.quantization import quantize_params
            params = quantize_params(params, compute_dtype=dtype or jnp.bfloat16)
        self.quantized = dq
        self.dims = dims
        self.params = params
        self.name = name
        self.alignment_heads = alignment_heads
        self.mesh = None
        self._vocab_path = vocab_path
        self._ranks = ranks
        self._tokenizers = {}

    # -- device mesh ---------------------------------------------------------------

    def shard(self, mesh=None, tp: Optional[int] = None) -> 'WhisperTPU':
        """Place the parameters on a (dp, tp) device mesh.

        Weights get Megatron column/row tensor shardings over ``tp``;
        subsequent ``transcribe_batched``/``decode`` calls shard the window
        batch axis over ``dp`` (SURVEY §5.7-§5.8: windows are the data axis,
        XLA inserts the collectives). Returns self.
        """
        from .parallel.mesh import build_mesh, shard_params
        if mesh is None:
            mesh = build_mesh(tp=tp)
        self.params = shard_params(self.params, mesh, self.dims)
        self.mesh = mesh
        if mesh.devices.size > 1:
            # Custom Pallas kernels have no pjit partitioning rule — keep
            # the sharded path on the plain XLA formulations (see
            # model.set_fused_kernels_enabled).
            from .models.whisper.model import set_fused_kernels_enabled
            set_fused_kernels_enabled(False)
        return self

    def shard_batch(self, arr):
        """device_put a window batch over the mesh dp axis.

        Pads the batch up to a dp multiple (sharding needs even splits) and
        returns (array, real_batch) — callers slice outputs back to
        ``real_batch``. No-op (identity, full length) without a mesh.
        """
        import jax
        import jax.numpy as jnp
        arr = jnp.asarray(arr)
        n = arr.shape[0]
        if self.mesh is None:
            return arr, n
        from .parallel.mesh import data_sharding
        dp = self.mesh.shape['dp']
        pad = (-n) % dp
        if pad:
            arr = jnp.concatenate([arr, jnp.repeat(arr[-1:], pad, axis=0)])
        return jax.device_put(arr, data_sharding(self.mesh, arr.ndim)), n

    # -- metadata -----------------------------------------------------------------

    @property
    def is_multilingual(self) -> bool:
        return self.dims.is_multilingual

    @property
    def num_languages(self) -> int:
        if self.dims.n_vocab >= 51865:
            return self.dims.num_languages
        # synthetic/test vocabs: assume the standard 99.
        return 99

    @property
    def device(self):
        import jax
        return jax.devices()[0]

    def __repr__(self):
        return (f'WhisperTPU(name={self.name!r}, n_vocab={self.dims.n_vocab}, '
                f'layers={self.dims.n_audio_layer}+{self.dims.n_text_layer}, '
                f'width={self.dims.n_audio_state})')

    # -- tokenizer ---------------------------------------------------------------------

    def get_tokenizer(self, language: Optional[str] = None,
                      task: Optional[str] = None) -> WhisperTokenizer:
        key = (language, task)
        if key not in self._tokenizers:
            if self._ranks is not None:
                tok = WhisperTokenizer(
                    self._ranks, multilingual=self.is_multilingual,
                    num_languages=self.num_languages, language=language,
                    task=task)
            else:
                tok = get_tokenizer(
                    multilingual=self.is_multilingual,
                    num_languages=self.num_languages,
                    language=language, task=task,
                    vocab_path=self._vocab_path)
            if tok.n_vocab > self.dims.n_vocab:
                raise ValueError(
                    f'tokenizer vocab ({tok.n_vocab}) exceeds model vocab '
                    f'({self.dims.n_vocab}); wrong vocabulary file?')
            self._tokenizers[key] = tok
        return self._tokenizers[key]

    # -- compute ------------------------------------------------------------------------------

    def embed_audio(self, mel):
        import jax.numpy as jnp
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        return encoder_apply(self.params['encoder'], mel, self.dims.n_audio_head)

    def decode(self, mel_or_features, options: Optional[DecodingOptions] = None,
               ts_silence_mask=None, language: Optional[str] = None,
               with_features: bool = True, **kwargs):
        if options is None:
            options = DecodingOptions(**kwargs)
        language = options.language or language
        if language is None:
            if self.is_multilingual:
                # whisper's DecodingTask detects the language when none is
                # given (decode.py: DecodingTask._detect_language); the
                # transcribe drivers detect upstream, so this only runs for
                # direct decode() calls
                langs, _ = self.detect_language(mel_or_features)
                language = langs[0]
            else:
                language = 'en'
        tokenizer = self.get_tokenizer(language=language, task=options.task)
        return _decode(self.params, self.dims, tokenizer, mel_or_features,
                       options, ts_silence_mask=ts_silence_mask,
                       with_features=with_features)

    def decode_launch(self, mel_or_features,
                      options: Optional[DecodingOptions] = None,
                      ts_silence_mask=None, language: Optional[str] = None,
                      **kwargs):
        """Dispatch a batched decode without blocking (see PendingDecode).

        Pass precomputed encoder features to reuse them across temperature
        fallbacks; pair with :meth:`decode_collect`.
        """
        if options is None:
            options = DecodingOptions(**kwargs)
        tokenizer = self.get_tokenizer(
            language=options.language or language or ('en' if not self.is_multilingual else 'en'),
            task=options.task)
        return _decode_launch(self.params, self.dims, tokenizer,
                              mel_or_features, options,
                              ts_silence_mask=ts_silence_mask)

    def decode_collect(self, pending, with_features: bool = True):
        """Block on a dispatched decode and return its DecodingResults."""
        return _decode_collect(pending, with_features=with_features)

    def detect_language(self, mel):
        tokenizer = self.get_tokenizer(language=None, task=None)
        return detect_language(self.params, self.dims, tokenizer, mel)

    # -- task methods -----------------------------------------------------------------------

    def transcribe(self, audio, **kwargs):
        from .transcribe import transcribe_stable
        return transcribe_stable(self, audio, **kwargs)

    def transcribe_minimal(self, audio, **kwargs):
        from .transcribe import transcribe_minimal
        return transcribe_minimal(self, audio, **kwargs)

    def transcribe_batched(self, audio, **kwargs):
        from .batched import transcribe_batched
        return transcribe_batched(self, audio, **kwargs)

    def align(self, audio, text, **kwargs):
        from .alignment import align
        return align(self, audio, text, **kwargs)

    def align_words(self, audio, result, **kwargs):
        from .alignment import align_words
        return align_words(self, audio, result, **kwargs)

    def refine(self, audio, result, **kwargs):
        from .alignment import refine
        return refine(self, audio, result, **kwargs)

    def locate(self, audio, text, **kwargs):
        from .alignment import locate
        return locate(self, audio, text, **kwargs)


def _find_vocab(checkpoint_path: str) -> Optional[str]:
    search_dirs = [os.path.dirname(os.path.abspath(checkpoint_path))]
    if os.environ.get('STABLE_TS_TPU_VOCAB_DIR'):
        search_dirs.insert(0, os.environ['STABLE_TS_TPU_VOCAB_DIR'])
    for d in search_dirs:
        for name in _VOCAB_CANDIDATES:
            p = os.path.join(d, name)
            if os.path.isfile(p):
                return p
    return None


def load_model(name_or_path: str,
               *,
               vocab_path: Optional[str] = None,
               dtype=None,
               alignment_heads: Optional[Sequence[Tuple[int, int]]] = None,
               download_root: Optional[str] = None,
               dq: bool = False,
               **_ignored) -> WhisperTPU:
    """Load a Whisper model from an OpenAI .pt file, an HF directory, or a
    model name resolved inside ``download_root``/$STABLE_TS_TPU_MODELS/
    ~/.cache/whisper.
    """
    path = name_or_path
    if not os.path.exists(path):
        roots = [download_root, os.environ.get('STABLE_TS_TPU_MODELS'),
                 os.path.expanduser('~/.cache/whisper')]
        for root in filter(None, roots):
            candidate = os.path.join(root, f'{name_or_path}.pt')
            if os.path.isfile(candidate):
                path = candidate
                break
        else:
            known = ', '.join(sorted(OPENAI_MODEL_DIMS))
            raise FileNotFoundError(
                f'checkpoint not found for {name_or_path!r}. Provide a path to '
                f'an OpenAI .pt file or an HF model directory. Known model '
                f'names (searched in download_root / $STABLE_TS_TPU_MODELS / '
                f'~/.cache/whisper): {known}')
    if os.path.isdir(path):
        from .models.whisper.load import (is_mlx_checkpoint_dir,
                                          load_mlx_checkpoint)
        if is_mlx_checkpoint_dir(path):
            dims, params = load_mlx_checkpoint(path)
        else:
            dims, params = load_hf_checkpoint(path)
    else:
        dims, params = load_openai_checkpoint(path)
    if alignment_heads is None:
        # Canonical per-model heads (whisper _ALIGNMENT_HEADS); checkpoints
        # the table doesn't know (HF fine-tunes, custom dims) keep None and
        # fall back to dynamic head selection in timing.py.
        from .models.whisper.alignment_heads import (get_alignment_heads,
                                                     resolve_model_name)
        known = resolve_model_name(name_or_path) or resolve_model_name(path)
        if known:
            alignment_heads = get_alignment_heads(
                known, dims.n_text_layer, dims.n_text_head)
    if vocab_path is None:
        vocab_path = _find_vocab(path if os.path.isdir(path)
                                 else os.path.dirname(path) or '.')
    if vocab_path is None and dims.n_vocab >= 51864:
        raise FileNotFoundError(
            'no tokenizer vocabulary found: place multilingual.tiktoken / '
            'gpt2.tiktoken / vocab.json next to the checkpoint, set '
            '$STABLE_TS_TPU_VOCAB_DIR, or pass vocab_path=.')
    return WhisperTPU(dims, params, name=os.path.basename(path),
                      vocab_path=vocab_path, dtype=dtype,
                      alignment_heads=alignment_heads, dq=dq)


def load_hf_whisper(name_or_path: str, **kwargs) -> WhisperTPU:
    """Load an HF Whisper directory (alias with the reference's loader name)."""
    return load_model(name_or_path, **kwargs)


def load_faster_whisper(model_size_or_path: str, **model_init_options):
    """Load a faster-whisper model wired into this package's stabilization
    pipeline (delegates to backends/faster_whisper.py; requires the optional
    faster-whisper package)."""
    from .backends.faster_whisper import load_faster_whisper as _load
    return _load(model_size_or_path, **model_init_options)


def load_mlx_whisper(name_or_path: str, **kwargs) -> WhisperTPU:
    """Load an MLX-community Whisper checkpoint directory onto the JAX/TPU
    engine (the reference runs these on Apple's MLX runtime; here the
    directory is just another weight format — models/whisper/load.py:
    load_mlx_checkpoint)."""
    return load_model(name_or_path, **kwargs)


def load_test_model(seed: int = 0, **kwargs) -> WhisperTPU:
    """A miniature random-weight model wired to the synthetic tokenizer —
    lets every pipeline run end-to-end offline."""
    from .models.whisper.model import tiny_test_dims
    from .models.whisper.tokenizer import synthetic_byte_ranks
    dims = tiny_test_dims()
    params = init_params(dims, seed=seed)
    return WhisperTPU(dims, params, name='test-tiny',
                      ranks=synthetic_byte_ranks(), **kwargs)


def modify_model(model):
    """Attach the stabilized method surface to ``model``, in place.

    Counterpart of the reference's ``modify_model``
    (whisper_word_level/original_whisper.py:931), which monkey-patches
    ``transcribe/align/refine/locate`` onto a vanilla ``whisper.Whisper``.
    Here:

    - :class:`WhisperTPU` already carries every stabilized method natively
      (JAX is functional; there is no foreign model to patch), so it passes
      through unchanged — calling this is always safe and idempotent.
    - A ``faster_whisper.WhisperModel`` gets the same method attachment
      ``load_faster_whisper`` performs.
    - Anything else raises ``TypeError`` pointing at the engine-agnostic
      seam (``transcribe_any`` / ``Aligner`` / ``Refiner``), which is how
      arbitrary ASR engines plug into this framework.
    """
    if isinstance(model, WhisperTPU):
        return model
    from .backends.faster_whisper import is_faster_whisper_model
    if is_faster_whisper_model(model):
        from .backends.faster_whisper import modify_fw_model
        return modify_fw_model(model)
    raise TypeError(
        f'cannot modify {type(model).__name__!r}: expected a WhisperTPU or a '
        'faster_whisper.WhisperModel. For other ASR engines use '
        'stable_ts_tpu.transcribe_any / Aligner / Refiner.')
