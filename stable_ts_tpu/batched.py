"""Batched (window-data-parallel) transcription: the TPU throughput path.

The reference's only batching is in alternative backends (HF pipeline
batch_size=24, faster-whisper BatchedInferencePipeline — SURVEY §2.3); its
own loop decodes one 30-s window at a time. Here the window axis IS the
batch axis (SURVEY §5.7's TPU-native plan):

- fixed-stride 30-s windows (no seek feedback -> windows are independent,
  like the reference's batched pipelines; prompt conditioning is off)
- ONE batched encoder + sampling-loop call per batch of windows
- temperature fallback re-decodes only the failed windows, batched
- the word-timing teacher-forced pass runs batched with right-padded token
  rows (exact under the causal mask) and a vmapped DTW cost kernel

On multi-chip meshes, shard the window axis with
``stable_ts_tpu.parallel.data_sharding`` — the batch here is the dp axis.
"""
import warnings
from typing import Callable, List, Optional, Union

import numpy as np

from .constants import (N_FRAMES, N_SAMPLES, N_SAMPLES_PER_TOKEN, SAMPLE_RATE,
                        TOKENS_PER_SECOND)
from .defaults import (get_append_punctuations, get_min_word_dur,
                       get_prepend_punctuations)
from .models.whisper.decoding import DecodingOptions, decode
from .ops.mel import log_mel_spectrogram
from .result import Segment, WhisperResult
from .stabilization import NonSpeechPredictor
from .profiling import traced


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


_NEXT_TOKEN_PROBS_FN = None


def _next_token_probs(logits, tokens):
    """(B, T, V) logits + (B, T) realized tokens -> (B, T-1) per-position
    probability of the token that actually follows (device-side gather: the
    word assembly never needs the full-vocab softmax on host)."""
    global _NEXT_TOKEN_PROBS_FN
    if _NEXT_TOKEN_PROBS_FN is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def fn(logits, tokens):
            probs = jax.nn.softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
            return jnp.take_along_axis(probs, tokens[:, 1:, None],
                                       axis=-1)[..., 0]
        _NEXT_TOKEN_PROBS_FN = fn
    return _NEXT_TOKEN_PROBS_FN(logits, tokens)


@traced('transcribe_batched')
def transcribe_batched(
        model,
        audio,
        *,
        batch_size: int = 8,
        language: Optional[str] = None,
        task: str = 'transcribe',
        temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        word_timestamps: bool = True,
        regroup: Union[bool, str] = True,
        suppress_silence: bool = True,
        suppress_word_ts: bool = True,
        use_word_position: bool = True,
        vad: Union[bool, dict, str] = False,
        vad_threshold: float = 0.35,
        q_levels: int = 20,
        k_size: int = 5,
        denoiser: Optional[str] = None,
        denoiser_options: Optional[dict] = None,
        only_voice_freq: bool = False,
        min_word_dur: Optional[float] = None,
        min_silence_dur: Optional[float] = None,
        nonspeech_error: float = 0.1,
        prepend_punctuations: Optional[str] = None,
        append_punctuations: Optional[str] = None,
        verbose: Optional[bool] = False,
        progress_callback: Optional[Callable] = None,
        dynamic_heads: Optional[Union[bool, int, str]] = None,
        aligner: Union[str, dict] = 'legacy',
        **decode_options,
) -> WhisperResult:
    """Transcribe with all 30-s windows batched (throughput-optimized).

    Semantics match :func:`transcribe_stable` with
    ``condition_on_previous_text=False`` and fixed-stride windows.
    """
    from .audio import prep_audio
    min_word_dur = get_min_word_dur(min_word_dur)
    prepend_punctuations = get_prepend_punctuations(prepend_punctuations)
    append_punctuations = get_append_punctuations(append_punctuations)
    punctuations = prepend_punctuations + append_punctuations

    audio = prep_audio(audio, denoiser=denoiser,
                       denoiser_options=denoiser_options,
                       only_voice_freq=only_voice_freq)
    total_samples = int(audio.shape[-1])
    total_duration = total_samples / SAMPLE_RATE
    n_windows = max(1, int(np.ceil(total_samples / N_SAMPLES)))

    # -- silence prediction per window (host) ------------------------------------
    predictor = NonSpeechPredictor(
        vad=vad if suppress_silence else None,
        min_word_dur=min_word_dur,
        q_levels=q_levels, k_size=k_size,
        vad_threshold=vad_threshold,
        sampling_rate=SAMPLE_RATE,
        verbose=None,
        store_timings=True,
        min_silence_dur=min_silence_dur,
    )
    windows = []
    window_meta = []
    for w in range(n_windows):
        seek = w * N_SAMPLES
        seg = audio[seek:seek + N_SAMPLES]
        preds = predictor.predict(seg, offset=seek / SAMPLE_RATE)
        window_meta.append(dict(
            seek=seek,
            samples=int(seg.shape[-1]),
            silence_timings=preds['timings'] if suppress_silence else None,
            is_silent=preds['is_silent'],
        ))
        if seg.shape[-1] < N_SAMPLES:
            seg = np.pad(seg, (0, N_SAMPLES - seg.shape[-1]))
        windows.append(seg)
    windows = np.stack(windows)  # (W, N_SAMPLES)

    active = [w for w in range(n_windows) if not window_meta[w]['is_silent']]
    if not active:
        result = WhisperResult(dict(text='', segments=[], language=language))
        predictor.finalize_timings()
        if predictor.nonspeech_timings:
            result.update_nonspeech_sections(*predictor.nonspeech_timings)
        warnings.warn(f'Failed to {task} audio. Result contains no text.')
        return result

    # -- batched mel + language detection -------------------------------------------
    mels = np.asarray(log_mel_spectrogram(windows[active], model.dims.n_mels))
    mels = mels[..., :N_FRAMES]

    if language is None:
        if model.is_multilingual:
            langs, _ = model.detect_language(mels[:1])
            language = langs[0]
            if verbose is not None:
                print(f'Detected language: {language}')
        else:
            language = 'en'
    tokenizer = model.get_tokenizer(language=language, task=task)

    # -- batched decode with per-window temperature fallback --------------------------
    temperatures = ([temperature] if isinstance(temperature, (int, float))
                    else list(temperature))
    results: List = [None] * len(active)
    pending = list(range(len(active)))
    for t in temperatures:
        if not pending:
            break
        kwargs = dict(decode_options)
        if t > 0:
            kwargs.pop('beam_size', None)
            kwargs.pop('patience', None)
        else:
            kwargs.pop('best_of', None)
        options = DecodingOptions(task=task, language=language,
                                  temperature=t, **kwargs)
        still_pending = []
        for chunk_start in range(0, len(pending), batch_size):
            chunk = pending[chunk_start:chunk_start + batch_size]
            # Pad short chunks (tail batch, fallback re-decodes) up to
            # batch_size by repeating window indices: every decode call then
            # shares ONE compiled program instead of one per chunk shape.
            padded = chunk + [chunk[-1]] * (batch_size - len(chunk))
            # On a mesh, the window batch is dp-sharded (padded to an even
            # split); slice the per-window results back to the real count.
            chunk_mels, n_real = model.shard_batch(mels[padded])
            chunk_results = model.decode(chunk_mels, options)[:n_real]
            for local, res in zip(chunk, chunk_results):
                needs_fallback = False
                if (compression_ratio_threshold is not None
                        and res.compression_ratio > compression_ratio_threshold):
                    needs_fallback = True
                if (logprob_threshold is not None
                        and res.avg_logprob < logprob_threshold):
                    needs_fallback = True
                if (no_speech_threshold is not None
                        and res.no_speech_prob > no_speech_threshold):
                    needs_fallback = False
                results[local] = res
                if needs_fallback:
                    still_pending.append(local)
        pending = still_pending
        if progress_callback is not None:
            progress_callback(min(total_duration, total_duration), total_duration)

    # -- split tokens into segments per window (host) ----------------------------------
    all_segments: List[dict] = []
    per_window_segments: List[List[dict]] = []
    time_precision = 1.0 / TOKENS_PER_SECOND
    for local, w in enumerate(active):
        res = results[local]
        meta = window_meta[w]
        time_offset = meta['seek'] / SAMPLE_RATE
        segment_duration = meta['samples'] / SAMPLE_RATE
        tokens = np.array(res.tokens)
        ts_begin = tokenizer.timestamp_begin

        if no_speech_threshold is not None:
            should_skip = res.no_speech_prob > no_speech_threshold
            if (logprob_threshold is not None
                    and res.avg_logprob > logprob_threshold):
                should_skip = False
            if should_skip:
                per_window_segments.append([])
                continue

        current_segments: List[dict] = []

        def new_segment(start, end, seg_tokens):
            seg_tokens = [int(x) for x in seg_tokens]
            return {
                'seek': round(time_offset, 3),
                'start': start, 'end': end,
                'text': tokenizer.decode([x for x in seg_tokens
                                          if x < tokenizer.eot]),
                'tokens': seg_tokens,
                'temperature': res.temperature,
                'avg_logprob': res.avg_logprob,
                'compression_ratio': res.compression_ratio,
                'no_speech_prob': res.no_speech_prob,
            }

        if len(tokens):
            ts_mask = tokens >= ts_begin
            consecutive = np.flatnonzero(ts_mask[:-1] & ts_mask[1:]) + 1
            single_ts_ending = (len(tokens) >= 2
                                and ts_mask[-2:].tolist() == [False, True])
            if len(consecutive):
                slices = consecutive.tolist()
                if single_ts_ending:
                    slices.append(len(tokens))
                last_slice = 0
                for cs in slices:
                    st = tokens[last_slice:cs]
                    current_segments.append(new_segment(
                        round(time_offset + (int(st[0]) - ts_begin)
                              * time_precision, 3),
                        round(time_offset + min((int(st[-1]) - ts_begin)
                                                * time_precision,
                                                segment_duration), 3),
                        st))
                    last_slice = cs
            else:
                duration = segment_duration
                stamps = tokens[ts_mask]
                if len(stamps) > 0 and int(stamps[-1]) != ts_begin:
                    duration = min((int(stamps[-1]) - ts_begin) * time_precision,
                                   segment_duration)
                current_segments.append(new_segment(
                    round(time_offset, 3),
                    round(time_offset + duration, 3), tokens))

        for i in reversed(range(len(current_segments))):
            seg = current_segments[i]
            if seg['text'].strip() in punctuations or \
                    (word_timestamps and seg['start'] == seg['end']):
                del current_segments[i]
        per_window_segments.append(current_segments)

    # -- batched word timing --------------------------------------------------------------
    if word_timestamps:
        _batched_word_timestamps(
            model, tokenizer, mels, active, window_meta, per_window_segments,
            prepend_punctuations, append_punctuations, min_word_dur,
            dynamic_heads, aligner, batch_size)

    # -- assemble + suppress + regroup -------------------------------------------------------
    for local, w in enumerate(active):
        meta = window_meta[w]
        segs = per_window_segments[local]
        if word_timestamps:
            segs = [s for s in segs if s.get('words')]
        if meta['silence_timings'] is not None and segs:
            for i, seg in enumerate(segs):
                seg_obj = Segment(**seg, ignore_unused_args=True).suppress_silence(
                    *meta['silence_timings'],
                    min_word_dur=min_word_dur,
                    word_level=suppress_word_ts,
                    nonspeech_error=nonspeech_error,
                    use_word_position=use_word_position)
                segs[i] = seg_obj.to_dict()
        all_segments.extend({'id': len(all_segments) + i, **s}
                            for i, s in enumerate(segs))

    text = ''.join(s['text'] for s in all_segments)
    final_result = WhisperResult(
        dict(text=text, segments=all_segments, language=language),
        force_order=not word_timestamps)

    predictor.finalize_timings()
    if suppress_silence and predictor.nonspeech_timings is not None:
        final_result.update_nonspeech_sections(*predictor.nonspeech_timings)
    if word_timestamps and regroup:
        final_result.regroup(regroup)
    if len(final_result.text) == 0:
        warnings.warn(f'Failed to {task} audio. Result contains no text.')
    return final_result


def _batched_word_timestamps(model, tokenizer, mels, active, window_meta,
                             per_window_segments, prepend_punctuations,
                             append_punctuations, min_word_dur,
                             dynamic_heads, aligner, batch_size: int = 8):
    """One padded teacher-forced QK pass for many windows + vmapped DTW.

    Right-padding the token rows is exact: under the causal mask, padding
    appended AFTER a window's real tokens cannot affect those tokens'
    logits or attention rows.
    """
    import jax
    import jax.numpy as jnp
    from .models.whisper.model import decoder_apply, encoder_apply
    from .models.whisper.timing import (WordTimingRaw, _matrices_to_jumps,
                                        merge_punctuations, pop_empty_alignment,
                                        split_word_tokens, _dynamic_head_weights,
                                        legacy_head_weights, new_aligner_matrix,
                                        build_head_capture_table,
                                        gather_captured_heads, find_alignment)

    # Collect per-window flattened tokens.
    prep = []
    for local, segs in enumerate(per_window_segments):
        if not segs:
            prep.append(None)
            continue
        for seg in segs:
            seg['words'] = []
        text_tokens, token_split, seg_indices = split_word_tokens(
            segs, tokenizer, padding=' ...')
        if not text_tokens:
            prep.append(None)
            continue
        prep.append((text_tokens, token_split, seg_indices))

    todo = [i for i, p in enumerate(prep) if p is not None]
    if not todo:
        return
    sot_seq = list(tokenizer.sot_sequence)
    max_len = max(len(prep[i][0]) for i in todo)
    padded_len = _bucket(len(sot_seq) + 1 + max_len + 1, 64)

    rows = []
    for i in todo:
        text_tokens = prep[i][0]
        row = sot_seq + [tokenizer.no_timestamps] + list(text_tokens) + [tokenizer.eot]
        row = row + [tokenizer.eot] * (padded_len - len(row))
        rows.append(row)
    tokens_arr = jnp.asarray(rows, jnp.int32)

    # Legacy mode with known heads: capture only the selected heads' QK
    # rows — (L, B, n_slots, T, 1500) instead of all heads, the difference
    # between the timing pass fitting in HBM or spilling at large batches.
    legacy_known = (aligner == 'legacy' and not isinstance(aligner, dict)
                    and model.alignment_heads is not None and not dynamic_heads)
    capture_index = capture_slots = None
    if legacy_known:
        capture_index, capture_slots = build_head_capture_table(
            model.alignment_heads, model.dims.n_text_layer)

    # Run the teacher-forced pass in batch_size chunks (padded to a constant
    # shape): device memory stays bounded no matter how long the audio is,
    # and every chunk reuses one compiled program.
    sot_len = len(sot_seq)
    n_windows = len(todo)
    chunk_n = min(batch_size, n_windows)
    max_qk_lens = [round(window_meta[active[i]]['samples'] / N_SAMPLES_PER_TOKEN)
                   for i in todo]
    row_counts = [len(prep[i][0]) + 1 for i in todo]  # n_text + 1
    # Fast path (the default config): legacy aligner + known heads + full
    # 30-s windows — head selection, normalization, and the DTW DP all stay
    # on device; only per-token probs and the small DTW cost matrices come
    # back to host. Short windows (reference crops BEFORE the median filter,
    # which device masking can't reproduce at the boundary) and the
    # dynamic/'new' modes take the per-window host path on downloaded QKs.
    device_weights = (capture_slots is not None
                      and all(m >= N_FRAMES // 2 for m in max_qk_lens))

    tok_prob_parts, qk_parts, cost_parts = [], [], []
    for cs in range(0, n_windows, chunk_n):
        n_sub = min(chunk_n, n_windows - cs)
        pos = list(range(cs, cs + n_sub)) + [cs + n_sub - 1] * (chunk_n - n_sub)
        mels_in, _ = model.shard_batch(mels[[todo[k] for k in pos]])
        tokens_in, _ = model.shard_batch(tokens_arr[np.asarray(pos)])
        xa = encoder_apply(model.params['encoder'], mels_in,
                           model.dims.n_audio_head)
        logits, qks = decoder_apply(model.params['decoder'], tokens_in, xa,
                                    model.dims.n_text_head, capture_qk=True,
                                    capture_index=capture_index)
        # per-position probability of the realized next token — the only
        # thing the word assembly needs from the logits (downloading the
        # full-vocab softmax would be ~0.5 GB per chunk)
        next_tok_probs = _next_token_probs(logits, tokens_in)
        tok_prob_parts.append(np.asarray(next_tok_probs[:n_sub]))
        if device_weights:
            from .models.whisper.timing import legacy_weights_batched
            layers = np.array([l for l, _ in capture_slots])
            cols = np.array([s for _, s in capture_slots])
            sel = qks[layers, :, cols]  # (n_sel, B, T, 1500)
            matrices_dev = legacy_weights_batched(
                sel, jnp.asarray(max_qk_lens[cs:cs + n_sub]
                                 + [1] * (chunk_n - n_sub), jnp.int32),
                jnp.asarray(row_counts[cs:cs + n_sub]
                            + [1] * (chunk_n - n_sub), jnp.int32),
                sot_len, 1.0, 7)
            from .ops.dtw import dtw_cost_jax, dtw_cost_pallas, _use_pallas
            cost_fn = dtw_cost_pallas if _use_pallas() else jax.jit(
                jax.vmap(dtw_cost_jax))
            cost_parts.append(np.asarray(cost_fn(-matrices_dev)[:n_sub],
                                         np.float64))
        else:
            # transfer the capture as bf16 (half the bytes) upcast on host
            qk_parts.append(np.asarray(qks[:, :n_sub]).astype(np.float32))
    tok_probs_all = np.concatenate(tok_prob_parts, axis=0)

    if device_weights:
        from .models.whisper.timing import _jumps_from_cost
        cost_all = np.concatenate(cost_parts, axis=0)
        all_jumps = [
            _jumps_from_cost(cost_all[bi, :row_counts[bi] + 1,
                                      :max_qk_lens[bi] + 1])
            for bi in range(n_windows)
        ]
    else:
        # qks: (L, B, H_or_slots, T, 1500); slice real rows per window.
        qks_np = np.concatenate(qk_parts, axis=1)
        matrices = []
        for bi, i in enumerate(todo):
            n_text = len(prep[i][0])
            qk = qks_np[:, bi, :, :sot_len + 1 + n_text + 1]
            max_qk_len = max_qk_lens[bi]
            # Head selection: same modes as find_alignment, per window.
            if aligner != 'legacy' or isinstance(aligner, dict):
                kwargs = dict(topk=20, w_colnorm=1.0, w_rownorm=1.0,
                              w_coverage=0.0)
                if isinstance(aligner, dict):
                    kwargs.update(aligner)
                matrix = new_aligner_matrix(
                    qk, max_qk_len, sot_len, 1.0,
                    medfilt_width=7,
                    topk=min(int(kwargs['topk']),
                             model.dims.n_text_layer * model.dims.n_text_head),
                    w_colnorm=float(kwargs['w_colnorm']),
                    w_rownorm=float(kwargs['w_rownorm']),
                    w_coverage=float(kwargs['w_coverage']))
            elif model.alignment_heads is not None and not dynamic_heads:
                if capture_slots is not None:
                    sel = gather_captured_heads(qk, capture_slots)
                else:
                    heads = np.asarray(model.alignment_heads)
                    sel = qk[heads[:, 0], heads[:, 1]]
                weights = legacy_head_weights(sel, max_qk_len, sot_len, 1.0, 7)
                matrix = weights.mean(axis=0)
            else:
                count = 6 if dynamic_heads in (None, True) else int(dynamic_heads)
                weights = _dynamic_head_weights(qk, sot_len, max_qk_len, 1.0, 7,
                                                count, None)
                matrix = weights.mean(axis=0)
            matrices.append(matrix)
        # One batched DTW DP for every window (lockstep Pallas kernel on TPU).
        all_jumps = _matrices_to_jumps(matrices)

    # Phase B: per-window word assembly from the jump times.
    for bi, i in enumerate(todo):
        text_tokens, token_split, seg_indices = prep[i]
        meta = window_meta[active[i]]
        n_text = len(text_tokens)
        text_token_probs = tok_probs_all[bi, sot_len:sot_len + n_text].tolist()

        words, word_tokens = token_split
        words = list(words) + [tokenizer.decode([tokenizer.eot])]
        word_tokens = list(word_tokens) + [[tokenizer.eot]]
        word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]),
                                 (1, 0))

        jump_indices = all_jumps[bi]
        jump_times = jump_indices / TOKENS_PER_SECOND
        start_times = jump_times[word_boundaries[:-1]]
        end_times = jump_times[word_boundaries[1:]]
        word_probs = [float(np.mean(text_token_probs[a:b]))
                      for a, b in zip(word_boundaries[:-1], word_boundaries[1:])]
        alignment = [WordTimingRaw(wd, tk, float(s), float(e), p)
                     for wd, tk, s, e, p in zip(words, word_tokens, start_times,
                                                end_times, word_probs)]
        segs = per_window_segments[i]
        alt_begin = pop_empty_alignment(alignment, seg_indices)
        merge_punctuations(alignment, prepend_punctuations, append_punctuations)
        time_offset = meta['seek'] / SAMPLE_RATE
        for si, timing in zip(seg_indices, alignment):
            if len(timing.tokens) == 0:
                continue
            start, end = timing.start, timing.end
            if (len(segs[si]['words']) == 0 and (end - start) < min_word_dur
                    and si in alt_begin):
                start = alt_begin[si].start
            segs[si]['words'].append(dict(
                word=timing.word,
                start=round(time_offset + start, 3),
                end=round(time_offset + end, 3),
                probability=timing.probability,
                tokens=timing.tokens))
        for seg in segs:
            if seg['words']:
                seg['start'] = seg['words'][0]['start']
                seg['end'] = seg['words'][-1]['end']
