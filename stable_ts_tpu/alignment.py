"""Whisper-backend glue for align / align_words / refine / locate.

Counterpart of /root/reference/stable_whisper/alignment.py: thin drivers that
construct the engine-agnostic :class:`Aligner`/:class:`Refiner` with
inference functions built on the JAX Whisper (mel -> encoder -> timing /
teacher-forced probability passes), plus ``locate`` — finding words in audio
without full transcription via cross-attention end estimates and a
kv-cached confirmation decode.
"""
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from .constants import (CHUNK_LENGTH, FRAMES_PER_SECOND, HOP_LENGTH, N_FFT,
                        N_FRAMES, N_SAMPLES, N_SAMPLES_PER_TOKEN, SAMPLE_RATE,
                        TOKENS_PER_SECOND)
from .non_whisper.alignment import Aligner, WordToken
from .non_whisper.refinement import Refiner
from .options import AllOptions
from .ops.mel import log_mel_spectrogram
from .result import Segment, WhisperResult
from .utils import format_timestamp, safe_print
from .profiling import traced

__all__ = ['align', 'align_words', 'refine', 'locate']


def _locate_spec_steps(dec, tok, pos, cross_kv, kv, sup_mask, k: int,
                       n_head: int):
    """``k`` greedy decode steps in ONE dispatch for locate's confirmation
    loop — returns every step's logits row so the host pays one device
    round-trip per K tokens instead of per token.

    Each step feeds the previous step's suppressed argmax (exactly the
    plain-greedy choice the host makes outside target-forcing regions);
    the host consumes rows while its own choice keeps matching and falls
    back to single steps on divergence. The KV cache after the call holds
    the speculated tokens' K/V — safe to resume from any accepted prefix
    because ``decoder_step`` overwrites slot ``pos`` before attending and
    masks positions beyond it (reference context: the reference re-runs
    the whole prefix per token, alignment.py:845-867)."""
    import jax
    import jax.numpy as jnp
    from .models.whisper.model import decoder_step

    def body(carry, _):
        tok, pos, kv = carry
        logits, kv = decoder_step(dec, tok, pos, cross_kv, kv, n_head)
        row = logits[0, :sup_mask.shape[0]].astype(jnp.float32)
        nxt = jnp.argmax(row + sup_mask).astype(jnp.int32)
        return (nxt.reshape(1, 1), pos + 1, kv), row

    (_, _, kv), rows = jax.lax.scan(body, (tok, pos, kv), None, length=k)
    return rows, kv


_locate_spec_steps_jit = None


def _get_spec_steps():
    global _locate_spec_steps_jit
    if _locate_spec_steps_jit is None:
        import jax
        _locate_spec_steps_jit = jax.jit(
            _locate_spec_steps, static_argnames=('k', 'n_head'))
    return _locate_spec_steps_jit


def _pad_mel(mel: np.ndarray) -> np.ndarray:
    """Pad/trim mel frames to exactly N_FRAMES."""
    if mel.shape[-1] >= N_FRAMES:
        return mel[..., :N_FRAMES]
    pad = N_FRAMES - mel.shape[-1]
    return np.pad(mel, [(0, 0)] * (mel.ndim - 1) + [(0, pad)])


def _resolve_tokenizer(model, text, language: Optional[str]):
    if language is None:
        language = getattr(text, 'language', None)
    from .backends.faster_whisper import fw_tokenizer, is_faster_whisper_model
    if is_faster_whisper_model(model):
        return fw_tokenizer(model, language)
    if language is None:
        if model.is_multilingual:
            raise TypeError('expected argument for language')
        language = 'en'
    return model.get_tokenizer(language=language, task='transcribe')


def _legacy_known_heads(model, options: AllOptions) -> bool:
    """True when the default timing mode applies: legacy aligner with the
    model's canonical alignment heads and no dynamic selection — the mode
    whose capture can be narrowed to ~10 head rows on device."""
    aligner = options.align.aligner
    return (aligner == 'legacy' and not isinstance(aligner, dict)
            and model.alignment_heads is not None
            and not options.align.dynamic_heads)


def _fused_single_window_func(model, tokenizer) -> Callable:
    """(audio_segment, word_tokens) -> word dicts via ONE device dispatch.

    The whole timing pass (mel, encoder, teacher-forced capture, head
    weights, DTW, traceback) runs as a single compiled program
    (timing._fused_align_window); only a packed (T' + T_pad - 1) f32
    vector crosses the host link. Token rows bucket to 32 so the compile
    set stays small across varying text lengths."""
    import jax.numpy as jnp
    from .models.whisper.timing import (_fused_align_window, WordTimingRaw,
                                        build_head_capture_table,
                                        merge_punctuations)

    capture_index, capture_slots = build_head_capture_table(
        model.alignment_heads, model.dims.n_text_layer)
    layers = jnp.asarray([l for l, _ in capture_slots], jnp.int32)
    cols = jnp.asarray([s for _, s in capture_slots], jnp.int32)
    sot_seq = list(tokenizer.sot_sequence)
    sot_len = len(sot_seq)

    def compute_timestamps(audio_segment: np.ndarray,
                           word_tokens: List[WordToken]) -> List[dict]:
        word_tokens_l = [wt.tokens for wt in word_tokens]
        text_tokens = [t for toks in word_tokens_l for t in toks]
        segment_samples = int(np.asarray(audio_segment).shape[-1])
        audio = np.zeros((1, N_SAMPLES), np.float32)
        n_real = min(segment_samples, N_SAMPLES)
        audio[0, :n_real] = audio_segment[..., :n_real]
        row = sot_seq + [tokenizer.no_timestamps] + text_tokens \
            + [tokenizer.eot]
        t_pad = max(32, -(-len(row) // 32) * 32)
        tokens = np.full((1, t_pad), tokenizer.eot, np.int32)
        tokens[0, :len(row)] = row
        n_text = len(text_tokens)
        qk_len = round(min(segment_samples, N_SAMPLES) / N_SAMPLES_PER_TOKEN)
        packed = np.asarray(_fused_align_window(
            model.params, capture_index, layers, cols,
            jnp.asarray(audio), jnp.asarray(tokens),
            jnp.int32(max(qk_len, 1)), jnp.int32(n_text + 1),
            n_mels=model.dims.n_mels, n_audio_head=model.dims.n_audio_head,
            n_text_head=model.dims.n_text_head, sot_len=sot_len,
            eot=tokenizer.eot))
        t_rows = t_pad - sot_len - 1
        jump_times = packed[:t_rows] / TOKENS_PER_SECOND
        probs = packed[t_rows:]
        text_token_probs = probs[sot_len:sot_len + n_text]

        return _assemble_word_dicts(word_tokens, word_tokens_l, jump_times,
                                    text_token_probs, tokenizer)

    return compute_timestamps


def _assemble_word_dicts(word_tokens, word_tokens_l, jump_times,
                         text_token_probs, tokenizer) -> List[dict]:
    """Host word assembly shared by the fused single-window and batched
    align paths — the exact structure add_word_timestamps produces with
    this path's arguments (no gap padding entries exist, and the empty
    punctuation sets make merge_punctuations a no-op)."""
    from .models.whisper.timing import WordTimingRaw, merge_punctuations
    words = [wt.word for wt in word_tokens] \
        + [tokenizer.decode([tokenizer.eot])]
    wts = list(word_tokens_l) + [[tokenizer.eot]]
    bounds = np.pad(np.cumsum([len(t) for t in wts[:-1]]), (1, 0))
    starts, ends = jump_times[bounds[:-1]], jump_times[bounds[1:]]
    word_probs = [float(np.mean(text_token_probs[a:b]))
                  for a, b in zip(bounds[:-1], bounds[1:])]
    alignment = [WordTimingRaw(w, tk, float(s), float(e), p)
                 for w, tk, s, e, p in zip(words, wts, starts, ends,
                                           word_probs)]
    merge_punctuations(alignment, '', '')
    return [dict(word=t.word, start=round(t.start, 3),
                 end=round(t.end, 3), probability=t.probability,
                 tokens=t.tokens)
            for t in alignment[:len(word_tokens)] if len(t.tokens)]


def _whisper_alignment_func(model, tokenizer, options: AllOptions) -> Callable:
    """(audio_segment, word_tokens) -> word timing dicts, via the JAX model
    (or the backend's own word-timing API for adapter models)."""
    from .backends.faster_whisper import (fw_alignment_func,
                                          is_faster_whisper_model)
    if is_faster_whisper_model(model):
        return fw_alignment_func(model, tokenizer)
    if _legacy_known_heads(model, options):
        return _fused_single_window_func(model, tokenizer)
    from .models.whisper.timing import add_word_timestamps

    def compute_timestamps(audio_segment: np.ndarray,
                           word_tokens: List[WordToken]) -> List[dict]:
        curr_words = [wt.word for wt in word_tokens]
        curr_word_tokens = [wt.tokens for wt in word_tokens]
        temp_segments = [dict(seek=0, tokens=(curr_words, curr_word_tokens))]
        segment_samples = int(audio_segment.shape[-1])
        sample_padding = max(N_SAMPLES - segment_samples, 0)
        mel_segment = np.asarray(log_mel_spectrogram(
            audio_segment, model.dims.n_mels, padding=sample_padding))
        mel_segment = _pad_mel(mel_segment)
        add_word_timestamps(
            segments=temp_segments,
            params=model.params,
            dims=model.dims,
            tokenizer=tokenizer,
            mel=mel_segment,
            num_samples=segment_samples,
            split_callback=(lambda x, _: x),
            prepend_punctuations='',
            append_punctuations='',
            gap_padding=None,
            alignment_heads=model.alignment_heads,
            dynamic_heads=options.align.dynamic_heads,
            aligner=options.align.aligner,
        )
        return [w for seg in temp_segments for w in seg['words']]

    return compute_timestamps


def _whisper_alignment_batch_func(model, tokenizer, options: AllOptions) -> Callable:
    """list[(audio_segment, word_tokens)] -> list[word timing dicts].

    One encoder + teacher-forced QK-capture forward for EVERY segment
    (right-padded token rows are exact under the causal mask), then the
    per-segment host pipeline (head selection, batched DTW, word assembly)
    runs on each segment's qks slice via ``add_word_timestamps`` with
    ``precomputed`` — identical host logic to the sequential path.
    """
    import jax.numpy as jnp
    from .batched import _next_token_probs
    from .models.whisper.model import decoder_apply, encoder_apply
    from .models.whisper.timing import (add_word_timestamps,
                                        build_head_capture_table)

    sot_seq = list(tokenizer.sot_sequence)
    sot_len = len(sot_seq)
    # Default mode (legacy aligner, known heads): capture ONLY the ~10
    # alignment heads' QK rows on device and download just those — the
    # full (L, B, H, T, 1500) capture is multi-GB at large-v3 and its host
    # download was what made align SLOWER than transcribe (the reference
    # promises the opposite, alignment.py:48-49).
    aligner = options.align.aligner
    legacy_known = (aligner == 'legacy' and not isinstance(aligner, dict)
                    and model.alignment_heads is not None
                    and not options.align.dynamic_heads)
    capture_index = capture_slots = None
    if legacy_known:
        capture_index, capture_slots = build_head_capture_table(
            model.alignment_heads, model.dims.n_text_layer)

    def batch_func(requests):
        audios, rows, metas = [], [], []
        for audio_segment, word_tokens in requests:
            text_tokens = [t for wt in word_tokens for t in wt.tokens]
            a = np.asarray(audio_segment, np.float32)
            audios.append(a)
            rows.append(sot_seq + [tokenizer.no_timestamps]
                        + list(text_tokens) + [tokenizer.eot])
            metas.append((word_tokens, text_tokens, int(a.shape[-1])))
        # segment audio uploads at its real (bucketed) length and the mel
        # computes batched ON DEVICE — the previous per-segment
        # log_mel + download + re-upload paid a host sync per segment
        # (~30 ms of tunnel latency each) and moved 30 s of mostly-zero
        # frames per row; log_mel_windowed reconstructs the zero-pad tail
        # bit-identically from the row max
        t_max = max(a.shape[-1] for a in audios) + N_FFT
        t_bucket = max(SAMPLE_RATE,
                       -(-t_max // SAMPLE_RATE) * SAMPLE_RATE)
        pad_rows = 1 << max(2, int(np.ceil(np.log2(len(audios)))))
        audio_batch = np.zeros((pad_rows, t_bucket), np.float32)
        for i, a in enumerate(audios):
            audio_batch[i, :a.shape[-1]] = a[:t_bucket]
        max_len = max(32, int(np.ceil(max(len(r) for r in rows) / 32) * 32))
        tok_batch = np.full((pad_rows, max_len), tokenizer.eot, np.int32)
        for i, row in enumerate(rows):
            tok_batch[i, :len(row)] = row

        from .ops.mel import log_mel_windowed
        # dp-sharded on a mesh (segments are embarrassingly parallel —
        # SURVEY §5.7); identity off-mesh. shard_batch may pad rows past
        # pad_rows; every consumer below indexes < len(metas).
        audio_in, _ = model.shard_batch(audio_batch)
        tokens_in, _ = model.shard_batch(tok_batch)
        mel_batch = log_mel_windowed(audio_in, model.dims.n_mels, N_FRAMES)
        xa = encoder_apply(model.params['encoder'], mel_batch,
                           model.dims.n_audio_head)
        logits, qks = decoder_apply(model.params['decoder'],
                                    tokens_in, xa,
                                    model.dims.n_text_head, capture_qk=True,
                                    capture_index=capture_index)
        # realized-next-token probs gathered ON DEVICE — the full-vocab
        # softmax download was ~160 MB per batch at large-v3
        tok_probs_dev = _next_token_probs(logits, tokens_in, tokenizer.eot)
        if capture_slots is not None:
            # Default mode: the WHOLE post-pass (head weights, DTW DP,
            # traceback) runs as ONE batched dispatch over every segment —
            # the previous per-segment loop dispatched ~4 small programs
            # and a download per segment (~30 ms of tunnel latency each),
            # which made align_words 2.4x slower than transcribe.
            layers = np.array([l for l, _ in capture_slots])
            cols = np.array([s for _, s in capture_slots])
            sel = qks[layers, :, cols]                  # (n_sel, B, T, 1500)
            pad_b = sel.shape[1]
            qk_lens = [round(min(samples, N_SAMPLES) / N_SAMPLES_PER_TOKEN)
                       or 1 for _, _, samples in metas]
            row_counts = [len(text_tokens) + 1
                          for _, text_tokens, _ in metas]
            qk_lens_in = jnp.asarray(
                qk_lens + [1] * (pad_b - len(metas)), jnp.int32)
            rows_in = jnp.asarray(
                row_counts + [1] * (pad_b - len(metas)), jnp.int32)
            from .batched import _dtw_cost_batched
            from .models.whisper.timing import legacy_weights_batched
            from .ops.dtw import dtw_jumps_device
            mats = legacy_weights_batched(sel, qk_lens_in, rows_in, sot_len,
                                          1.0, 7)
            cost = _dtw_cost_batched(-mats)
            jumps = np.asarray(dtw_jumps_device(cost, rows_in, qk_lens_in))
            tok_probs = np.asarray(tok_probs_dev)
            outputs = []
            for i, (word_tokens, text_tokens, _) in enumerate(metas):
                n_text = len(text_tokens)
                jump_times = jumps[i, :row_counts[i]] / TOKENS_PER_SECOND
                probs = tok_probs[i, sot_len:sot_len + n_text]
                outputs.append(_assemble_word_dicts(
                    word_tokens, [wt.tokens for wt in word_tokens],
                    jump_times, probs, tokenizer))
            return outputs

        qks_np = np.asarray(qks)            # dynamic/'new': needs all heads
        tok_probs = np.asarray(tok_probs_dev)
        outputs = []
        for i, (word_tokens, text_tokens, segment_samples) in enumerate(metas):
            n_text = len(text_tokens)
            t_keep = sot_len + 1 + n_text + 1
            qks_i = qks_np[:, i, :, :t_keep]
            text_token_probs = tok_probs[i, sot_len:sot_len + n_text].tolist()
            curr_words = [wt.word for wt in word_tokens]
            curr_word_tokens = [wt.tokens for wt in word_tokens]
            temp_segments = [dict(seek=0,
                                  tokens=(curr_words, curr_word_tokens))]
            add_word_timestamps(
                segments=temp_segments,
                params=model.params,
                dims=model.dims,
                tokenizer=tokenizer,
                mel=None,
                num_samples=segment_samples,
                split_callback=(lambda x, _: x),
                prepend_punctuations='',
                append_punctuations='',
                gap_padding=None,
                alignment_heads=model.alignment_heads,
                dynamic_heads=options.align.dynamic_heads,
                aligner=options.align.aligner,
                precomputed=(qks_i, text_token_probs),
            )
            outputs.append([w for seg in temp_segments for w in seg['words']])
        return outputs

    return batch_func


@traced('align')
def align(
        model,
        audio,
        text: Union[str, List[int], WhisperResult],
        language: Optional[str] = None,
        *,
        tokenizer=None,
        ignore_compatibility: bool = False,
        remove_instant_words: bool = False,
        token_step: int = 100,
        original_split: bool = False,
        word_dur_factor: Optional[float] = 2.0,
        max_word_dur: Optional[float] = 3.0,
        nonspeech_skip: Optional[float] = 5.0,
        fast_mode: bool = False,
        failure_threshold: Optional[float] = None,
        **options,
) -> Optional[WhisperResult]:
    """Align plain text (or a prior result) to audio at word level."""
    if tokenizer is None:
        tokenizer = _resolve_tokenizer(model, text, language)
    all_options = AllOptions(options, vanilla_align=True)
    n_text_ctx = model.dims.n_text_ctx if hasattr(model, 'dims') else 448
    max_token_step = n_text_ctx - 6
    if token_step < 1:
        token_step = max_token_step
    elif token_step > max_token_step:
        raise ValueError(f'The max value for [token_step] is {max_token_step} '
                         f'but got {token_step}.')

    aligner = Aligner(
        inference_func=_whisper_alignment_func(model, tokenizer, all_options),
        decode=tokenizer.decode,
        encode=tokenizer.encode,
        split_words_by_space=(getattr(tokenizer, 'language', 'en')
                              not in {'zh', 'ja', 'th', 'lo', 'my', 'yue'}),
        sample_rate=SAMPLE_RATE,
        max_segment_length=N_SAMPLES,
        remove_instant_words=remove_instant_words,
        token_step=token_step,
        original_split=original_split,
        word_dur_factor=word_dur_factor,
        max_word_dur=max_word_dur,
        nonspeech_skip=nonspeech_skip,
        fast_mode=fast_mode,
        failure_threshold=failure_threshold,
        all_options=all_options,
    )
    result = aligner.align(audio, text)
    if result is not None:
        result.language = getattr(tokenizer, 'language', language)
    return result


@traced('align_words')
def align_words(
        model,
        audio,
        result: Union[WhisperResult, List[dict]],
        language: Optional[str] = None,
        *,
        tokenizer=None,
        inplace: bool = True,
        normalize_text: bool = True,
        parallel: Optional[bool] = None,
        ignore_compatibility: bool = False,  # reference surface; no torch-
                                             # whisper version check applies
        **options,
) -> WhisperResult:
    """Confined per-segment alignment using each segment's start/end.

    ``parallel`` (default: auto — on for TPU backends) computes every
    segment's timing forward in one batched pass; segments are independent
    here so results are identical to the sequential path.
    """
    if tokenizer is None:
        tokenizer = _resolve_tokenizer(model, result, language)
    from .backends.faster_whisper import is_faster_whisper_model
    if parallel is None:
        import jax
        parallel = jax.default_backend() == 'tpu'
    if is_faster_whisper_model(model):
        parallel = False  # lockstep batching is a JAX-engine feature
    all_options = AllOptions(options, vanilla_align=True)
    aligner = Aligner(
        inference_func=_whisper_alignment_func(model, tokenizer, all_options),
        batch_inference_func=(
            _whisper_alignment_batch_func(model, tokenizer, all_options)
            if parallel else None),
        decode=tokenizer.decode,
        encode=tokenizer.encode,
        split_words_by_space=(getattr(tokenizer, 'language', 'en')
                              not in {'zh', 'ja', 'th', 'lo', 'my', 'yue'}),
        sample_rate=SAMPLE_RATE,
        max_segment_length=N_SAMPLES,
        all_options=all_options,
    )
    new_result = aligner.align_words(audio, result, normalize_text, inplace)
    new_result.language = getattr(tokenizer, 'language', language)
    return new_result


def _whisper_refinement_func(model, tokenizer) -> Callable:
    """(audio[2, T], tokens) -> token probs (2, n_tokens[, vocab<eot])."""
    from .backends.faster_whisper import (fw_refinement_func,
                                          is_faster_whisper_model)
    if is_faster_whisper_model(model):
        return fw_refinement_func(model, tokenizer)
    import jax
    import jax.numpy as jnp
    from .models.whisper.model import decoder_apply, encoder_apply

    def inference_func(audio_segment: np.ndarray, tokens: List[int]) -> np.ndarray:
        input_tokens = [*tokenizer.sot_sequence, tokenizer.no_timestamps,
                        *tokens, tokenizer.eot]
        mel = np.asarray(log_mel_spectrogram(np.asarray(audio_segment),
                                             model.dims.n_mels))
        mel = _pad_mel(mel)
        xa = encoder_apply(model.params['encoder'], jnp.asarray(mel),
                           model.dims.n_audio_head)
        tok_arr = jnp.asarray(input_tokens, jnp.int32)[None].repeat(mel.shape[0], 0)
        logits, _ = decoder_apply(model.params['decoder'], tok_arr, xa,
                                  model.dims.n_text_head)
        sot_len = len(tokenizer.sot_sequence)
        sampled = logits[:, sot_len:sot_len + len(tokens), :tokenizer.eot]
        return np.asarray(jax.nn.softmax(sampled, axis=-1))

    return inference_func


def _refine_mel_batch(audio, frames, n_mels):
    """(R, T_bucket) muted audio rows -> (R, n_mels, 3000) device mels.

    Per-row real frame counts arrive as an ARRAY so every round of a step
    reuses one compiled program regardless of how span lengths mix; frames
    beyond a row's real count are zeroed (the host path zero-padded mels
    the same way, _pad_mel)."""
    global _REFINE_MEL_FN
    if _REFINE_MEL_FN is None:
        import jax
        from functools import partial

        @partial(jax.jit, static_argnames=('n_mels',))
        def fn(audio, frames, n_mels):
            import jax.numpy as jnp
            mel = log_mel_spectrogram(audio, n_mels)   # (R, n_mels, T//160)
            mask = (jnp.arange(mel.shape[-1])[None, None, :]
                    < frames[:, None, None])
            mel = jnp.where(mask, mel, 0.0)
            if mel.shape[-1] >= 3000:
                return mel[..., :3000]
            return jnp.pad(mel, ((0, 0), (0, 0), (0, 3000 - mel.shape[-1])))
        _REFINE_MEL_FN = fn
    return _REFINE_MEL_FN(audio, frames, n_mels=n_mels)


_REFINE_MEL_FN = None


def _masked_mel_body(clean, t_real, lo, hi, n_mels):
    """Trace-time body: muted rows -> (2S, n_mels, 3000) mels.

    clean (S, T_bucket) span audio, t_real (S,) real sample counts, lo/hi
    (2S, W) per-row disjoint zero intervals (lo == hi = empty slot).
    Rebuilds each span's two muted rows exactly as the host path would have
    assembled them — zeros on the intervals, the STFT's 200-sample reflect
    continuation of the MUTED row written into the pad. The interval
    scatter is O(T) via a +1/-1 boundary cumsum, so each bisection round
    uploads a few int32s instead of every muted row's samples."""
    import jax.numpy as jnp
    s, t_pad = clean.shape
    r = 2 * s
    rows = jnp.repeat(clean, 2, axis=0)            # (R, T)
    t_r = jnp.repeat(t_real, 2)                    # (R,)
    ridx = jnp.arange(r)[:, None]
    diff = jnp.zeros((r, t_pad + 1), jnp.float32)
    diff = diff.at[ridx, jnp.clip(lo, 0, t_pad)].add(1.0)
    diff = diff.at[ridx, jnp.clip(hi, 0, t_pad)].add(-1.0)
    # prefix-sum of the +1/-1 boundaries as a TWO-LEVEL scan whose inner
    # level is a triangular-ones matmul on the MXU: XLA's native cumsum
    # along a ~500k-sample lane axis lowers to a slow cross-lane ladder
    # (it was most of this prologue's device time). Counts are bounded by
    # the interval slot count (<= W « 2**24), so f32 accumulation is exact
    # and the mask is bit-identical to jnp.cumsum(diff) > 0.
    seg = 512
    t_c = -(-t_pad // seg)
    d3 = jnp.pad(diff[:, :t_pad],
                 ((0, 0), (0, t_c * seg - t_pad))).reshape(r, t_c, seg)
    tri = jnp.asarray(np.triu(np.ones((seg, seg), np.float32)))
    inner = jnp.einsum('rcs,si->rci', d3, tri,
                       preferred_element_type=jnp.float32)
    tot = jnp.cumsum(inner[..., -1], axis=1)
    carry = jnp.concatenate([jnp.zeros((r, 1), jnp.float32),
                             tot[:, :-1]], axis=1)
    muted = ((inner + carry[..., None]).reshape(r, t_c * seg)[:, :t_pad]
             > 0.5)
    rows = jnp.where(muted, 0.0, rows)
    # reflect continuation of the MUTED row into the pad
    # (np.pad 'reflect': padded[t + i] = row[t - 2 - i]) — via a SMALL
    # (R, 200) gather + scatter-add; the previous formulation ran a full
    # (R, T) take_along_axis, which gathers ~31 MB/row at vector-memory
    # speed just to move 200 samples
    pos = jnp.arange(t_pad)[None, :]
    t_col = t_r[:, None]
    refl = jnp.minimum(N_FFT // 2, t_col - 1)
    i = jnp.arange(N_FFT // 2)[None, :]
    src = jnp.clip(t_col - 2 - i, 0, t_pad - 1)
    padvals = jnp.take_along_axis(rows, src, axis=1)        # (R, 200)
    live = (i < refl) & (t_col + i < t_pad)
    dst = jnp.clip(t_col + i, 0, t_pad - 1)
    base = jnp.where(pos < t_col, rows, 0.0)
    rows = base.at[ridx, dst].add(jnp.where(live, padvals, 0.0))
    mel = log_mel_spectrogram(rows, n_mels)
    frames = jnp.minimum(t_r // HOP_LENGTH, 3000)
    mask = (jnp.arange(mel.shape[-1])[None, None, :]
            < frames[:, None, None])
    mel = jnp.where(mask, mel, 0.0)
    if mel.shape[-1] >= 3000:
        return mel[..., :3000]
    return jnp.pad(mel, ((0, 0), (0, 0), (0, 3000 - mel.shape[-1])))


def _refine_masked_mel(clean, t_real, lo, hi, n_mels):
    """Device-side muted-row mel reconstruction (jitted _masked_mel_body)."""
    global _REFINE_MASK_MEL_FN
    if _REFINE_MASK_MEL_FN is None:
        import jax
        from functools import partial
        _REFINE_MASK_MEL_FN = partial(jax.jit, static_argnames=('n_mels',))(
            _masked_mel_body)
    return _REFINE_MASK_MEL_FN(clean, t_real, lo, hi, n_mels=n_mels)


_REFINE_MASK_MEL_FN = None


def _refine_round_fused(model, clean, t_real, slots, lo, hi, tokens, eot):
    """ONE dispatch per bisection round: gather the still-active spans,
    rebuild their muted rows, mel + encoder + teacher-forced decoder +
    realized-token prob/rank reduction — all inside a single jitted
    program returning a single (2, R, L-1) float32 array (ranks ride as
    exact float32; vocab ids < 2**24).

    The unfused path was 3 small uploads + 4 jit dispatches + 2 downloads
    per round; on the tunneled TPU every host<->device edge costs a
    round-trip, and refine's serial bisection pays it ~20x per step. The
    fused round pays ONE dispatch and ONE download. ``slots`` additionally
    gathers only spans that still have live words, so late rounds stop
    paying the full step batch's encoder (spans collapse at different
    rounds on real audio)."""
    global _REFINE_ROUND_FUSED_FN
    if _REFINE_ROUND_FUSED_FN is None:
        import jax
        import jax.numpy as jnp
        from functools import partial
        from .models.whisper.model import decoder_apply, encoder_apply

        @partial(jax.jit, static_argnames=('n_mels', 'n_audio_head',
                                           'n_text_head', 'eot'))
        def fn(enc_params, dec_params, clean, t_real, slots, lo, hi,
               tokens, n_mels, n_audio_head, n_text_head, eot):
            clean = clean[slots]
            t_real = t_real[slots]
            mel = _masked_mel_body(clean, t_real, lo, hi, n_mels)
            xa = encoder_apply(enc_params, mel, n_audio_head)
            logits, _ = decoder_apply(dec_params, tokens, xa, n_text_head)
            # realized-token prob + vocab rank, same semantics as
            # batched._next_token_probs_and_ranks (inlined so the whole
            # round is one program)
            lg = logits[:, :-1, :eot].astype(jnp.float32)
            idx = jnp.clip(tokens[:, 1:, None], 0, eot - 1)
            v = jnp.take_along_axis(lg, idx, axis=-1)
            vocab_iota = jnp.arange(eot, dtype=jnp.int32)
            ranks = (jnp.sum(lg < v, axis=-1, dtype=jnp.int32)
                     + jnp.sum((lg == v) & (vocab_iota < idx), axis=-1,
                               dtype=jnp.int32))
            probs = jax.nn.softmax(lg, axis=-1)
            per_token = jnp.take_along_axis(probs, idx, axis=-1)[..., 0]
            return jnp.stack([per_token, ranks.astype(jnp.float32)])
        _REFINE_ROUND_FUSED_FN = fn
    return _REFINE_ROUND_FUSED_FN(
        model.params['encoder'], model.params['decoder'], clean, t_real,
        slots, lo, hi, tokens, n_mels=model.dims.n_mels,
        n_audio_head=model.dims.n_audio_head,
        n_text_head=model.dims.n_text_head, eot=eot)


_REFINE_ROUND_FUSED_FN = None


def _whisper_refinement_batch_func(model, tokenizer) -> Callable:
    """list[(audio(2, T_i), tokens_i)] -> list[(probs (2, n_i),
    ranks (2, n_i))] — realized-token probabilities and vocab ranks.

    The lockstep refine driver (non_whisper/refinement.py) evaluates every
    pending span's probe in ONE forward per bisection round: all 2S muted
    variants batch through the encoder+decoder with right-padded token rows
    (exact under causal masking). Batch, token, and audio lengths are
    bucketed so XLA compiles a handful of shapes, not one per round.

    Everything heavy stays on device: muted audio uploads at its bucketed
    real length (with the STFT's 200-sample reflect continuation written
    into the pad, so kept mel frames are bit-identical to an exact-length
    transform), mels feed the encoder without a host round-trip, and only
    the (2, n) realized-token probs + ranks ever download — the previous
    full-vocab softmax download was ~400 MB per bisection round at
    large-v3, dwarfing the compute on a slow host link.
    """
    import jax.numpy as jnp
    from .batched import _next_token_probs_and_ranks
    from .models.whisper.model import decoder_apply, encoder_apply

    sot_seq = list(tokenizer.sot_sequence)
    sot_len = len(sot_seq)

    def _bucket(n: int, step: int) -> int:
        return max(step, int(np.ceil(n / step) * step))

    # interval-mode step caches, one per pipeline group (``key``): every
    # span's clean audio uploads ONCE per refine step; each bisection round
    # then ships only the mute intervals (a few int32s) and the muted rows
    # rebuild on device (_refine_masked_mel). 'keep' pins the host arrays
    # so ids stay unique.
    states = {}

    import os
    fused_rounds = (os.environ.get('STABLE_TS_TPU_REFINE_FUSED', '1') != '0'
                    and model.mesh is None)

    def _launch_intervals(requests, key):
        probes = [p for p, _ in requests]
        toks = [sot_seq + [tokenizer.no_timestamps] + list(t)
                + [tokenizer.eot] for _, t in requests]
        lengths = [len(t) for _, t in requests]
        state = states.setdefault(key, {})
        epoch = getattr(probes[0], 'epoch', None)
        if state.get('epoch') != epoch:
            # new step epoch (fresh span set): rebuild the device-side clean
            # cache. A new epoch's FIRST round carries every span of this
            # group (the Refiner stamps the epoch per span-set build), so
            # the cache covers all later (shrinking) rounds; an unknown span
            # arriving mid-epoch is a protocol violation and raises below
            # (state['map'] KeyError) instead of silently re-uploading
            # every round.
            t_max = max(p.clean.shape[-1] for p in probes)
            # 5-s audio buckets on the fused path: the audio length only
            # shapes the (cheap) masked-mel prologue — the encoder always
            # sees 3000 mel frames — but each distinct bucket compiles a
            # full fused encoder+decoder program, so coarser is better
            t_bucket = _bucket(t_max + N_FFT // 2,
                               (5 if fused_rounds else 1) * SAMPLE_RATE)
            s_b = 1 << max(0, int(np.ceil(np.log2(len(probes)))))
            # on a mesh, shard_batch pads rows to a dp multiple; the masked
            # mel kernel needs lo/hi rows == 2 x clean rows, so the span
            # bucket itself must already be a dp multiple
            if model.mesh is not None:
                dp = model.mesh.shape['dp']
                s_b = max(s_b, dp if dp & (dp - 1) == 0
                          else int(np.lcm(s_b, dp)))
            clean_host = np.zeros((s_b, t_bucket), np.float32)
            t_real = np.zeros((s_b,), np.int32)
            for i, p in enumerate(probes):
                t = p.clean.shape[-1]
                clean_host[i, :t] = p.clean
                t_real[i] = t
            clean_in, _ = model.shard_batch(clean_host)
            treal_in, _ = model.shard_batch(t_real)
            state.clear()
            state.update(
                epoch=epoch,
                map={id(p.clean): i for i, p in enumerate(probes)},
                keep=[p.clean for p in probes], clean=clean_in,
                t_real=treal_in, s_b=s_b, w_b=8,
                max_len=_bucket(max(len(r) for r in toks), 32))
        s_b = state['s_b']
        max_len = max(state['max_len'],
                      _bucket(max(len(r) for r in toks), 32))
        state['max_len'] = max_len
        w_need = max((int(np.sum(p.rows == r)) for p in probes
                      for r in (0, 1)), default=1)
        while state['w_b'] < w_need:
            state['w_b'] *= 2
        w_b = state['w_b']

        if fused_rounds:
            # gather ONLY the spans still holding live words: a bucketed
            # slot vector feeds the single fused round program, so late
            # rounds stop paying the whole step batch's encoder
            a_b = 1 << max(0, int(np.ceil(np.log2(len(probes)))))
            slot_list = [state['map'][id(p.clean)] for p in probes]
            slots_pad = np.asarray(
                slot_list + [slot_list[-1]] * (a_b - len(probes)), np.int32)
            lo = np.zeros((2 * a_b, w_b), np.int32)
            hi = np.zeros((2 * a_b, w_b), np.int32)
            tok_batch = np.full((2 * a_b, max_len), tokenizer.eot, np.int32)
            for i, (p, row_tok) in enumerate(zip(probes, toks)):
                padded = np.pad(row_tok, (0, max_len - len(row_tok)),
                                constant_values=tokenizer.eot)
                tok_batch[2 * i] = padded
                tok_batch[2 * i + 1] = padded
                for r in (0, 1):
                    sel = p.rows == r
                    cnt = int(sel.sum())
                    lo[2 * i + r, :cnt] = p.zero_lo[sel]
                    hi[2 * i + r, :cnt] = p.zero_hi[sel]
            stacked = _refine_round_fused(
                model, state['clean'], state['t_real'], slots_pad, lo, hi,
                tok_batch, tokenizer.eot)
            return stacked, [2 * i for i in range(len(probes))], lengths

        n_rows = 2 * s_b
        lo = np.zeros((n_rows, w_b), np.int32)
        hi = np.zeros((n_rows, w_b), np.int32)
        tok_batch = np.full((n_rows, max_len), tokenizer.eot, np.int32)
        slots = []
        for p, row_tok in zip(probes, toks):
            slot = state['map'][id(p.clean)]
            slots.append(slot)
            padded = np.pad(row_tok, (0, max_len - len(row_tok)),
                            constant_values=tokenizer.eot)
            tok_batch[2 * slot] = padded
            tok_batch[2 * slot + 1] = padded
            for r in (0, 1):
                sel = p.rows == r
                cnt = int(sel.sum())
                lo[2 * slot + r, :cnt] = p.zero_lo[sel]
                hi[2 * slot + r, :cnt] = p.zero_hi[sel]
        lo_in, _ = model.shard_batch(lo)
        hi_in, _ = model.shard_batch(hi)
        tokens_in, _ = model.shard_batch(tok_batch)
        mel_batch = _refine_masked_mel(state['clean'], state['t_real'],
                                       lo_in, hi_in, model.dims.n_mels)
        xa = encoder_apply(model.params['encoder'], mel_batch,
                           model.dims.n_audio_head)
        logits, _ = decoder_apply(model.params['decoder'], tokens_in, xa,
                                  model.dims.n_text_head)
        per_token, ranks = _next_token_probs_and_ranks(logits, tokens_in,
                                                       tokenizer.eot)
        return per_token, ranks, [2 * s for s in slots], lengths

    def collect(handle):
        """Materialize a launched round's device arrays -> reply list."""
        if len(handle) == 3:       # fused round: ONE stacked download
            stacked, row0s, lengths = handle
            arr = np.asarray(stacked)
            per_token, ranks = arr[0], arr[1].astype(np.int64)
        else:
            per_token, ranks, row0s, lengths = handle
            per_token = np.asarray(per_token)
            ranks = np.asarray(ranks)
        out = []
        for r0, n in zip(row0s, lengths):
            sl = (slice(r0, r0 + 2), slice(sot_len, sot_len + n))
            out.append((per_token[sl], ranks[sl]))
        return out

    def launch(requests, key=0):
        """Dispatch one bisection round WITHOUT materializing its results:
        returns a handle for :func:`collect`. The lockstep driver overlaps
        two span groups through this split — group A's round computes on
        device while group B's host update runs."""
        from .non_whisper.refinement import MutedSpanProbe
        if requests and isinstance(requests[0][0], MutedSpanProbe):
            return _launch_intervals(requests, key)
        return _launch_audio(requests)

    def _launch_audio(requests):
        audios = []
        rows = []
        lengths = []
        for audio_segment, tokens in requests:
            a = np.asarray(audio_segment, np.float32)
            audios.append(a[None] if a.ndim == 1 else a)
            rows.append(sot_seq + [tokenizer.no_timestamps] + list(tokens)
                        + [tokenizer.eot])
            lengths.append(len(tokens))
        # one audio bucket per round (span lengths are fixed across a
        # step's rounds, so this compiles once per step): room for the
        # longest span plus the 200-sample reflect tail, 1-s granularity
        t_max = max(a.shape[-1] for a in audios)
        t_bucket = _bucket(t_max + N_FFT // 2, SAMPLE_RATE)
        n_rows = sum(a.shape[0] for a in audios)
        pad_rows = 1 << max(1, int(np.ceil(np.log2(n_rows))))
        audio_batch = np.zeros((pad_rows, t_bucket), np.float32)
        frames = np.zeros((pad_rows,), np.int32)
        r = 0
        for a in audios:
            t = a.shape[-1]
            refl = min(N_FFT // 2, t - 1) if t > 1 else 0
            for row in a:
                audio_batch[r, :t] = row
                if refl:
                    # np.pad 'reflect' continuation: padded[t+i] = row[t-2-i]
                    # (stop index pinned to None when the reflection reaches
                    # row[0] — a negative stop would wrap and empty the slice
                    # for spans of <= N_FFT//2 + 1 samples)
                    stop = t - 2 - refl
                    audio_batch[r, t:t + refl] = \
                        row[t - 2:stop if stop >= 0 else None:-1]
                frames[r] = min(t // HOP_LENGTH, 3000)
                r += 1
        max_len = _bucket(max(len(row) for row in rows), 32)
        tok_batch = np.full((pad_rows, max_len), tokenizer.eot, np.int32)
        row_starts = np.zeros(len(audios), np.int32)
        r = 0
        for i, (a, row) in enumerate(zip(audios, rows)):
            row_starts[i] = r
            padded = np.pad(row, (0, max_len - len(row)),
                            constant_values=tokenizer.eot)
            for _ in range(a.shape[0]):
                tok_batch[r] = padded
                r += 1

        # dp-sharded on a mesh (spans are independent); identity off-mesh
        audio_in, _ = model.shard_batch(audio_batch)
        frames_in, _ = model.shard_batch(frames)
        tokens_in, _ = model.shard_batch(tok_batch)
        mel_batch = _refine_mel_batch(audio_in, frames_in, model.dims.n_mels)
        xa = encoder_apply(model.params['encoder'], mel_batch,
                           model.dims.n_audio_head)
        logits, _ = decoder_apply(model.params['decoder'], tokens_in, xa,
                                  model.dims.n_text_head)
        per_token, ranks = _next_token_probs_and_ranks(logits, tokens_in,
                                                       tokenizer.eot)
        return per_token, ranks, [int(r) for r in row_starts], lengths

    def batch_func(requests):
        return collect(launch(requests))

    import os
    batch_func.accepts_intervals = (
        os.environ.get('STABLE_TS_TPU_REFINE_INTERVALS', '1') != '0')
    batch_func.launch = launch
    batch_func.collect = collect
    return batch_func


@traced('refine')
def refine(
        model,
        audio,
        result: WhisperResult,
        *,
        steps: Optional[str] = None,
        rel_prob_decrease: float = .03,
        abs_prob_decrease: float = .05,
        rel_rel_prob_decrease: Optional[float] = None,
        prob_threshold: float = .5,
        rel_dur_change: Optional[float] = .5,
        abs_dur_change: Optional[float] = None,
        word_level: bool = True,
        precision: Optional[float] = None,
        single_batch: bool = False,
        inplace: bool = True,
        parallel: Optional[bool] = None,
        **options,
) -> WhisperResult:
    """Sharpen ``result``'s timestamps by iterative mute-and-bisect probing.

    ``parallel`` (default: auto — on for TPU backends) runs every span's
    bisection in lockstep with one batched forward per round instead of a
    sequential per-span loop; ``single_batch=True`` forces the sequential
    per-span path (reference CLI compat).
    """
    if result and (not result.has_words
                   or any(w.probability is None for w in result.all_words())):
        if not result.language:
            raise RuntimeError('cannot align words with result missing language')
        align_words(model, audio, result)
    from .backends.faster_whisper import fw_tokenizer, is_faster_whisper_model
    if is_faster_whisper_model(model):
        tokenizer = fw_tokenizer(model, result.language)
    else:
        tokenizer = model.get_tokenizer(language=result.language,
                                        task='transcribe')
    if result and not all(w.tokens for w in result.all_words()):
        for word in result.all_words():
            word.tokens = tokenizer.encode(word.word)

    if parallel is None:
        import jax
        parallel = jax.default_backend() == 'tpu'
    if single_batch or is_faster_whisper_model(model):
        parallel = False
    all_options = AllOptions(options, post=False, silence=False, align=False)
    refiner = Refiner(
        inference_func=_whisper_refinement_func(model, tokenizer),
        batch_inference_func=(_whisper_refinement_batch_func(model, tokenizer)
                              if parallel else None),
        sample_rate=SAMPLE_RATE,
        steps=steps,
        rel_prob_decrease=rel_prob_decrease,
        abs_prob_decrease=abs_prob_decrease,
        rel_rel_prob_decrease=rel_rel_prob_decrease,
        prob_threshold=prob_threshold,
        rel_dur_change=rel_dur_change,
        abs_dur_change=abs_dur_change,
        word_level=word_level,
        precision=precision,
        max_inference_tokens=(model.dims.n_text_ctx - 6
                              if hasattr(model, 'dims') else 442),
        all_options=all_options,
    )
    return refiner.refine(audio, result, inplace)


@traced('locate')
def locate(
        model,
        audio,
        text: Union[str, List[int]],
        language: str,
        count: int = 1,
        duration_window: Union[float, Tuple[float, float]] = 3.0,
        *,
        mode: int = 0,
        start: Optional[float] = None,
        end: Optional[float] = None,
        probability_threshold: float = 0.5,
        eots: int = 1,
        max_token_per_seg: int = 20,
        exact_token: bool = False,
        case_sensitive: bool = False,
        verbose: Optional[bool] = False,
        initial_prompt: Optional[str] = None,
        suppress_tokens: Union[str, List[int]] = '-1',
        denoiser: Optional[str] = None,
        denoiser_options: Optional[dict] = None,
        only_voice_freq: bool = False,
        demucs=None,
        demucs_options: Optional[dict] = None,
) -> Union[List[Segment], List[dict]]:
    """Find when ``text`` is spoken without transcribing everything.

    mode 2: end-time estimate only (argmax of the last text token's
    cross-attention row). mode 1: + confirmation decode around the estimate.
    mode 0: + word timestamps on the confirmed match.
    """
    import os
    import jax
    import jax.numpy as jnp
    from .audio import prep_audio
    from .audio.denoiser import convert_demucs_kwargs
    denoiser, denoiser_options = convert_demucs_kwargs(
        denoiser, denoiser_options, demucs=demucs,
        demucs_options=demucs_options)
    from .models.whisper.decoding import DecodingOptions, build_suppress_list, \
        build_initial_tokens
    from .models.whisper.model import (decoder_apply, decoder_step, encoder_apply,
                                       precompute_cross_kv, decoder_prefill)
    from .models.whisper.timing import add_word_timestamps
    from .ops.median import median_filter

    tokenizer = model.get_tokenizer(language=language, task='transcribe')
    sec_per_emb = model.dims.n_audio_ctx / CHUNK_LENGTH
    chunk_samples = round(CHUNK_LENGTH * SAMPLE_RATE)
    if isinstance(duration_window, (float, int)):
        duration_window = [duration_window] * 2
    window_sum = sum(duration_window)
    assert chunk_samples > window_sum, \
        f'Sum of [duration_window] must be less than {chunk_samples}, got {window_sum}'
    adjusted_chunk_size = chunk_samples - round(duration_window[0] * SAMPLE_RATE)
    if initial_prompt:
        initial_prompt = ' ' + initial_prompt.strip()
    d_options = DecodingOptions(language=language, prompt=initial_prompt,
                                suppress_tokens=suppress_tokens,
                                without_timestamps=True)
    initial_tokens, _, _ = build_initial_tokens(tokenizer, d_options,
                                                model.dims.n_text_ctx)
    if isinstance(text, str):
        text_tokens, text_str = tokenizer.encode(text), text
    else:
        text_tokens, text_str = list(text), tokenizer.decode(text)
    if not exact_token and not case_sensitive:
        text_str = text_str.lower()
    suppress_ids = [i for i in build_suppress_list(tokenizer, d_options)
                    if i < tokenizer.eot]

    audio = prep_audio(audio, denoiser=denoiser,
                       denoiser_options=denoiser_options,
                       only_voice_freq=only_voice_freq)
    if end:
        audio = audio[:round(end * SAMPLE_RATE)]
    seek_sample = round(start * SAMPLE_RATE) if start else 0
    total_samples = audio.shape[-1]
    prev_target_end = None
    found = 0

    # With known alignment heads, capture ONLY those heads' QK rows on
    # device (same selective-capture table the batched timing pass uses) —
    # the full (L, H, T, 1500) capture is what kept the estimate pass fat.
    if model.alignment_heads is not None:
        from .models.whisper.timing import build_head_capture_table
        loc_capture_index, loc_capture_slots = build_head_capture_table(
            model.alignment_heads, model.dims.n_text_layer)
    else:
        loc_capture_index = loc_capture_slots = None

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=('n_mels', 'n_audio_head',
                                        'n_text_head'))
    def _estimate_program(params, capture_index, layers, cols, audio,
                          tokens, *, n_mels, n_audio_head, n_text_head):
        """ONE dispatch per search chunk: mel -> encoder -> teacher-forced
        capture -> normalized attention matrix -> argmax of the last text
        token's row. Only a scalar frame index crosses the host link (the
        unfused path downloaded the (T, 1500) matrix and paid ~4 dispatch
        round-trips per chunk — what kept locate ~8x slower than
        transcribe). The mel stays resident for the confirmation decode."""
        mel = log_mel_spectrogram(audio, n_mels)[..., :N_FRAMES]
        xa = encoder_apply(params['encoder'], mel, n_audio_head)
        _, qks = decoder_apply(params['decoder'], tokens, xa, n_text_head,
                               capture_qk=True, capture_index=capture_index)
        if layers is not None:
            weights = qks[layers, 0, cols]           # (n_sel, T, 1500)
        else:
            L, B, H, T, F = qks.shape
            weights = qks[:, 0].reshape(L * H, T, F)
        # capture is bf16 in HBM — upcast before softmax/normalization
        # (repo rule; bf16 softmax quantizes the attention peaks the argmax
        # below rides on), and guard zero std (single-token T)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1)
        std = jnp.std(weights, axis=-2, keepdims=True)
        mean = jnp.mean(weights, axis=-2, keepdims=True)
        weights = median_filter((weights - mean)
                                / jnp.where(std == 0, 1.0, std), 7)
        matrix = weights.mean(axis=0)
        return jnp.argmax(matrix[-1]).astype(jnp.int32), mel

    est_layers = est_cols = None
    if loc_capture_slots is not None:
        est_layers = jnp.asarray([l for l, _ in loc_capture_slots], jnp.int32)
        est_cols = jnp.asarray([s for _, s in loc_capture_slots], jnp.int32)

    def launch_estimate(seek_s: int):
        """Dispatch the end-estimate for the chunk at ``seek_s`` WITHOUT
        blocking — returns device arrays (frame index scalar + resident
        mel). JAX dispatch is asynchronous, so the caller can queue the
        next chunk's estimate behind the current chunk's confirmation
        work and hide the whole encoder+capture pass."""
        segment = audio[seek_s:seek_s + chunk_samples]
        padded = np.zeros(N_SAMPLES, np.float32)
        padded[:segment.shape[-1]] = segment[:N_SAMPLES]
        tokens = jnp.asarray([initial_tokens + text_tokens], jnp.int32)
        frame, mel_dev = _estimate_program(
            model.params, loc_capture_index, est_layers, est_cols,
            jnp.asarray(padded)[None], tokens,
            n_mels=model.dims.n_mels, n_audio_head=model.dims.n_audio_head,
            n_text_head=model.dims.n_text_head)
        return frame, mel_dev

    # speculative estimate prefetch: chunk k+1's seek position is known
    # whenever chunk k does NOT match (fixed stride advance), which is the
    # common case of a scan — so its estimate is dispatched before chunk
    # k's host-side confirmation runs, and by the time the scan moves on
    # the frame index is already materialized. A match advances the seek
    # differently and simply misses the cache (entry dropped).
    _spec_est = {}

    from .models.whisper.decoding import _use_cross_kernel
    from .models.whisper.model import fuse_self_qkv, precompute_cross_kv_t
    dec_step_params = dict(model.params['decoder'])
    dec_step_params['blocks'] = fuse_self_qkv(dec_step_params['blocks'])
    # worst-case token count: initial prompt + the bounded prediction run
    confirm_cache_len = min(
        model.dims.n_text_ctx,
        ((len(initial_tokens) + max_token_per_seg + 8 + 127) // 128) * 128)

    def greedy_confirm(mel_section: np.ndarray):
        """KV-cached greedy decode with target-token forcing and rollback.

        The reference re-runs the whole prefix through the model per token
        (alignment.py:845-867 rebuilds inference_tokens each step); here the
        common append-one-token case is ONE ``decoder_step`` against the
        held KV cache, and only a rollback (suffix replaced) re-prefills —
        prefill lengths are bucketed to 32 so XLA compiles a handful of
        shapes, not one per prefix length."""
        xa = encoder_apply(model.params['encoder'],
                           jnp.asarray(mel_section)[None], model.dims.n_audio_head)
        if _use_cross_kernel():
            cross_kv = precompute_cross_kv_t(model.params['decoder'], xa)
        else:
            cross_kv = precompute_cross_kv(model.params['decoder'], xa)
        state = dict(kv=None, tokens=[], spec=None, greedy_run=0,
                     last_n=None, last_greedy=None)
        spec_k = 0 if os.environ.get('STABLE_TS_TPU_SPEC') == '0' else 8
        if spec_k:
            sup_mask_np = np.zeros(tokenizer.eot + 1, np.float32)
            sup_mask_np[suppress_ids] = -np.inf
            sup_mask = jnp.asarray(sup_mask_np)

        def _serve(row: np.ndarray, n: int) -> np.ndarray:
            # remember what plain greedy would append so the next call can
            # tell whether the host is in a greedy run (speculation only
            # pays there; target-forcing regions fall back to single steps)
            sup = row.copy()
            sup[suppress_ids] = -np.inf
            state['last_n'], state['last_greedy'] = n, int(np.argmax(sup))
            return row

        def logits_at(tokens_so_far: List[int]):
            n = len(tokens_so_far)
            if state['last_n'] is not None:
                state['greedy_run'] = (
                    state['greedy_run'] + 1
                    if (n == state['last_n'] + 1
                        and tokens_so_far[-1] == state['last_greedy'])
                    else 0)
            buf = state['spec']
            if buf is not None:
                off = n - buf['n0']
                if (0 <= off < buf['rows'].shape[0]
                        and tokens_so_far[:buf['n0']] == buf['base']
                        and tokens_so_far[buf['n0']:] == buf['toks'][:off]):
                    state['tokens'] = list(tokens_so_far)
                    return _serve(buf['rows'][off].copy(), n)
                state['spec'] = None
            if (state['kv'] is not None and n == len(state['tokens']) + 1
                    and n <= confirm_cache_len
                    and tokens_so_far[:-1] == state['tokens']):
                tok = jnp.asarray([[tokens_so_far[-1]]], jnp.int32)
                if (spec_k and state['greedy_run'] >= 2
                        and n - 1 + spec_k <= confirm_cache_len):
                    # host has been following plain greedy: run the next
                    # spec_k steps in one dispatch and buffer the rows
                    rows, state['kv'] = _get_spec_steps()(
                        dec_step_params, tok, jnp.int32(n - 1), cross_kv,
                        state['kv'], sup_mask, k=spec_k,
                        n_head=model.dims.n_text_head)
                    rows = np.asarray(rows)
                    toks = [int(np.argmax(r + sup_mask_np)) for r in rows]
                    state['spec'] = dict(n0=n, base=list(tokens_so_far),
                                         rows=rows, toks=toks)
                    state['tokens'] = list(tokens_so_far)
                    return _serve(rows[0].copy(), n)
                logits, state['kv'] = decoder_step(
                    dec_step_params, tok,
                    jnp.int32(n - 1), cross_kv, state['kv'],
                    model.dims.n_text_head)
                state['tokens'] = list(tokens_so_far)
                return _serve(np.array(logits[0, :tokenizer.eot + 1]), n)
            # (re)prefill, right-padded to a 32-bucket (positions past the
            # real prefix hold junk K/V but decoder_step masks them out and
            # overwrites slot n before attending)
            pad = min(confirm_cache_len, -(-n // 32) * 32)
            toks = jnp.asarray(
                [tokens_so_far + [tokenizer.eot] * (pad - n)], jnp.int32)
            logits, state['kv'] = decoder_prefill(
                model.params['decoder'], toks, xa, model.dims.n_text_head,
                confirm_cache_len)
            state['tokens'] = list(tokens_so_far)
            return _serve(np.array(logits[0, n - 1, :tokenizer.eot + 1]), n)

        infer_tokens = list(initial_tokens)
        predictions = []
        target_token_idx = 0
        not_end = True
        found_target = False
        curr_eots = 0
        tokens_to_decode: List[int] = []
        replace_found_tokens: List[int] = []
        while not_end:
            logits = logits_at(infer_tokens)
            logits[suppress_ids] = -np.inf
            order = np.argsort(logits)
            best_token = int(order[-1])
            best_non_eot = int(order[-2]) if best_token == tokenizer.eot else best_token
            probs = logits[:tokenizer.eot]
            probs = np.exp(probs - probs.max())
            probs /= probs.sum()
            if found_target:
                target_word_prob = is_match = None
            else:
                if exact_token:
                    is_match = False
                else:
                    tokens_to_decode.append(best_non_eot)
                    temp_text = tokenizer.decode(tokens_to_decode)
                    if not case_sensitive:
                        temp_text = temp_text.lower()
                    if is_match := temp_text.endswith(text_str):
                        tokens_to_decode = []
                target_word_prob = float(probs[text_tokens[target_token_idx]])
            if (target_word_prob is not None
                    and (target_word_prob >= probability_threshold
                         or best_non_eot == text_tokens[target_token_idx]
                         or is_match)):
                if is_match:
                    best_token = best_non_eot
                    token_prob = float(probs[best_token])
                    found_target = True
                else:
                    if replace_found_tokens or best_non_eot != text_tokens[target_token_idx]:
                        replace_found_tokens.append(best_non_eot)
                    best_token = text_tokens[target_token_idx]
                    target_token_idx += 1
                    if target_token_idx == len(text_tokens):
                        found_target = True
                    token_prob = target_word_prob
                curr_eots = 0
            else:
                if not found_target:
                    if replace_found_tokens:
                        n = len(replace_found_tokens)
                        infer_tokens = infer_tokens[:-n] + replace_found_tokens
                        replace_found_tokens = []
                    target_token_idx = 0
                if best_token == tokenizer.eot:
                    if curr_eots >= eots or found_target:
                        not_end = False
                    else:
                        curr_eots += 1
                        best_token = best_non_eot
                else:
                    curr_eots = 0
                token_prob = (None if best_token == tokenizer.eot
                              else float(probs[best_token]))
            predictions.append(dict(token=best_token, prob=token_prob))
            if len(predictions) > max_token_per_seg:
                not_end = False
            if not_end:
                infer_tokens.append(best_token)
        return found_target, predictions

    @jax.jit
    def _mel_section_dev(mel, start, end):
        """Device twin of ``_pad_mel(mel[..., start:end])`` — the confirm
        window's mel slice without downloading + re-uploading the chunk's
        (n_mels, 3000) mel through the host link."""
        n_frames = mel.shape[-1]
        idx = jnp.arange(n_frames)
        src = jnp.clip(start + idx, 0, n_frames - 1)
        width = jnp.minimum(end, n_frames) - start
        return jnp.where(idx < width, mel[:, src], 0.0)

    def _locate():
        nonlocal seek_sample, found, prev_target_end
        seek = round(seek_sample / SAMPLE_RATE, 3)
        audio_segment = audio[seek_sample:seek_sample + chunk_samples]

        if seek_sample in _spec_est:
            frame, mel_dev = _spec_est.pop(seek_sample)
        else:
            frame, mel_dev = launch_estimate(seek_sample)
        _spec_est.clear()
        if mode != 2 and not (count and found + 1 >= count):
            # dispatch the next no-match chunk's estimate behind this one —
            # unless a confirm here would already reach ``count`` and end
            # the search, where the speculation is a wasted full device
            # pass per confirmed match (ADVICE r4)
            nxt = seek_sample + (adjusted_chunk_size
                                 if audio_segment.shape[-1] == chunk_samples
                                 else audio_segment.shape[-1])
            if nxt < total_samples:
                _spec_est[nxt] = launch_estimate(nxt)
        target_end = round(float(frame) / sec_per_emb, 3)
        mel_segment = mel_dev[0]
        found_msg = (f'"{text_str}" ending at ~{format_timestamp(target_end + seek)}'
                     if verbose else '')

        if mode == 2:
            if found_msg:
                safe_print('Unconfirmed: ' + found_msg)
            found += 1
            if ((seek_sample + chunk_samples >= total_samples)
                    or (count and found >= count)
                    or (prev_target_end == target_end)):
                seek_sample = total_samples
            else:
                seek_sample += round(target_end * SAMPLE_RATE)
            prev_target_end = target_end
            return dict(tokens=[], target_end=target_end + seek)

        curr_start = round(max(target_end - duration_window[0], 0.), 3)
        curr_end = round(target_end + duration_window[1], 3)
        start_frame = round(curr_start * FRAMES_PER_SECOND)
        end_frame = round(curr_end * FRAMES_PER_SECOND)
        mel_section = _pad_mel(mel_segment[..., start_frame:end_frame])

        found_target, predictions = greedy_confirm(mel_section)
        segment = None
        if found_target:
            if found_msg:
                safe_print('Confirmed: ' + found_msg)
            final_tokens = [p['token'] for p in predictions]
            if mode == 1:
                from .models.whisper.timing import split_word_tokens
                _, (ws, wts), _ = split_word_tokens(
                    [dict(tokens=final_tokens)], tokenizer)
                final_token_probs = [p['prob'] for p in predictions]
                wps = [float(np.mean([final_token_probs.pop(0) or 0.0
                                      for _ in wt])) for wt in wts]
                words = [dict(word=w, tokens=wt, probability=wp)
                         for w, wt, wp in zip(ws, wts, wps)]
                segment = dict(end=target_end + seek, text=text_str,
                               duration_window_text=''.join(ws),
                               duration_window_word=words)
                if verbose:
                    safe_print(f'Duration Window: "{"".join(ws)}"\n')
                seek_sample += round(curr_end * SAMPLE_RATE)
            else:
                segment = dict(seek=0, tokens=final_tokens)
                add_word_timestamps(
                    segments=[segment],
                    params=model.params,
                    dims=model.dims,
                    tokenizer=tokenizer,
                    mel=mel_segment,
                    num_samples=round(curr_end * SAMPLE_RATE),
                    gap_padding=None,
                    alignment_heads=model.alignment_heads,
                )
                segment = Segment(words=segment['words'])
                seek_sample += round(segment.words[-1].end * SAMPLE_RATE)
                segment.offset_time(seek)
                segment.seek = curr_start
                if verbose:
                    safe_print(segment.to_display_str())
            found += 1
        else:
            seek_sample += (adjusted_chunk_size
                            if audio_segment.shape[-1] == chunk_samples
                            else audio_segment.shape[-1])
        return segment

    matches = []
    while seek_sample < total_samples and (not count or found < count):
        match = _locate()
        if match:
            matches.append(match)
    if verbose and not matches:
        safe_print(f'Failed to locate "{text_str}".')
    return matches
