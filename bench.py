"""Benchmark: transcription throughput (xRT) of Whisper large-v3 on one chip.

Two modes (BENCH_MODE):

- ``e2e`` (default): the PRODUCT number. Runs ``transcribe_batched()`` on
  BENCH_MINUTES of synthesized speech-like audio through the full public
  path — mel extraction, silence prediction, batched decode with the real
  temperature-fallback ladder, batched word timing (QK capture + DTW +
  traceback), silence suppression, result assembly, regroup, and SRT
  rendering. This matches the reference's unit of work
  (original_whisper.py:27-774). Decode length is data-dependent.

- ``kernel``: the device-kernel upper bound. Per 30-s window: encoder
  forward, KV-cached greedy decode of a fixed BENCH_TOKENS tokens, one
  teacher-forced timing pass, batched Pallas DTW + host traceback. Random
  weights have identical FLOPs/traffic to trained ones; the fixed token
  count makes the number workload-honest rather than gibberish-dependent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; the e2e
phase breakdown goes to stderr.
Baseline target (BASELINE.md): 20x real-time for large-v3 per TPU v5e chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODE = os.environ.get('BENCH_MODE', 'e2e')
# defaults = the sustained long-form configuration (batch 32 over 30 min):
# larger batch amortizes the per-step weight stream (~1.4 GB fixed) over
# more windows — measured 210.7 xRT at b32 vs 180.7 at b16 on the round-4
# kernel stack (decode calls halve; cross-KV traffic scales with batch so
# the win tapers). Small batches lose on short audio to tail padding;
# long-form is the product's use case.
BATCH = int(os.environ.get('BENCH_BATCH', '32' if MODE == 'e2e' else '8'))
TOKENS_PER_WINDOW = int(os.environ.get('BENCH_TOKENS', '224'))
MODEL = os.environ.get('BENCH_MODEL', 'large-v3')
ITERS = int(os.environ.get('BENCH_ITERS', '3'))
MINUTES = float(os.environ.get('BENCH_MINUTES', '30'))
BASELINE_XRT = 20.0


def synth_speech_like(seconds: float, sr: int = 16000):
    """Speech-shaped test signal: band-limited noise bursts with pauses.

    Bursts of 1-6 s separated by 0.2-1.5 s silences, amplitude-modulated at
    syllable rate (~4 Hz), band-passed to the voice band — enough structure
    that VAD/suppression and segment splitting do real work.
    """
    import numpy as np
    from scipy.signal import butter, sosfilt
    rng = np.random.default_rng(0)
    total = int(seconds * sr)
    out = np.zeros(total, np.float32)
    sos = butter(4, [120, 4000], btype='bandpass', fs=sr, output='sos')
    pos = 0
    while pos < total:
        burst = int(rng.uniform(1.0, 6.0) * sr)
        burst = min(burst, total - pos)
        noise = rng.standard_normal(burst)
        t = np.arange(burst) / sr
        envelope = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(3, 5) * t
                                        + rng.uniform(0, 6.28))
        out[pos:pos + burst] = sosfilt(sos, noise) * envelope * 0.15
        pos += burst + int(rng.uniform(0.2, 1.5) * sr)
    # Quantize to int16 PCM — the wire format real audio arrives in
    # (ffmpeg s16le, WAV/FLAC). The driver keeps exact-PCM input int16
    # through to the device upload (half the transfer bytes), so the bench
    # should exercise that product path, not a float-only special case.
    return (np.clip(out, -1.0, 1.0) * 32767.0).round().astype(np.int16)


def _enable_cache():
    try:
        from stable_ts_tpu.utils import enable_compilation_cache
        cache_dir = enable_compilation_cache()
        n = len([f for f in os.listdir(cache_dir)]) if os.path.isdir(cache_dir) else 0
        print(f'[bench] compilation cache at {cache_dir}: {n} entries '
              f'({"warm" if n else "cold"})', file=sys.stderr)
    except Exception as exc:  # cache is an optimization, never a failure
        print(f'[bench] compilation cache unavailable: {exc}', file=sys.stderr)


def build_model():
    """Random-weight model of the benched size with a real BPE rank table
    (FLOPs/traffic identical to trained weights; zero egress)."""
    import jax.numpy as jnp
    from stable_ts_tpu.loaders import WhisperTPU
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper.model import ModelDimensions, init_params

    dims = ModelDimensions(**OPENAI_MODEL_DIMS[MODEL])
    params = init_params(dims, seed=0, dtype=jnp.bfloat16)
    # synthetic rank table sized like the real multilingual vocab: the BPE
    # engine does real merges over the byte ranks; fillers pad the id space
    ranks = {bytes([b]): b for b in range(256)}
    i = 256
    base_ranks = 50257 if dims.n_vocab >= 51865 else dims.n_vocab - 1608
    while len(ranks) < base_ranks:
        ranks[b'\x00' + i.to_bytes(3, 'big')] = i
        i += 1
    from stable_ts_tpu.models.whisper.alignment_heads import get_alignment_heads
    return WhisperTPU(dims, params, name=MODEL, ranks=ranks,
                      dq=bool(os.environ.get('BENCH_DQ')),
                      alignment_heads=get_alignment_heads(
                          MODEL, dims.n_text_layer, dims.n_text_head))


_TUNNEL = None


def _probe_tunnel(refresh: bool = False):
    """Inline link probe (same method as tools/probe_tunnel.py): upload
    16 MB of incompressible data, force completion via a pre-compiled
    reduction materialized to host, subtract the warm scalar roundtrip.
    The result qualifies every number this process prints — a degraded
    tunnel can then never masquerade as a kernel regression.

    When the probe is DEGRADED, polls (bounded by BENCH_WAIT_MINUTES,
    default 12) for a healthy window before letting the timed iterations
    run, and stamps ``tunnel_healthy`` into the JSON either way — a flat
    round number can never again be ambiguous between kernels and
    transport (VERDICT r4 weak #1)."""
    global _TUNNEL
    if _TUNNEL is not None and not refresh:
        return _TUNNEL
    import jax
    import numpy as np
    x = (np.random.default_rng(0)
         .integers(-2**31, 2**31, size=(2048, 2048), dtype=np.int64)
         .astype(np.float32))
    dev = jax.devices()[0]
    f = jax.jit(lambda a: (a * 2).sum())
    resident = jax.device_put(x, dev)
    float(f(resident))

    wait_budget = float(os.environ.get('BENCH_WAIT_MINUTES', '12')) * 60.0
    deadline = time.monotonic() + wait_budget
    while True:
        t0 = time.perf_counter()
        float(f(resident))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(jax.device_put(x, dev)))
        up = max(time.perf_counter() - t0 - warm, 1e-6)
        mbps = round(16.0 / up, 1)
        healthy = mbps > 100 and warm < 0.5
        _TUNNEL = {'tunnel_MBps': mbps,
                   'tunnel_roundtrip_s': round(warm, 4),
                   'tunnel_healthy': healthy}
        state = ('healthy' if healthy else
                 'DEGRADED — transfer-heavy phases inflate; see BASELINE.md')
        print(f'[bench] tunnel: {mbps} MB/s up, {warm * 1e3:.1f} ms warm '
              f'roundtrip ({state})', file=sys.stderr)
        remaining = deadline - time.monotonic()
        if healthy or remaining <= 0:
            if not healthy:
                print('[bench] WARNING: proceeding on a degraded tunnel '
                      f'(waited {wait_budget / 60:.0f} min); the JSON is '
                      'stamped tunnel_healthy: false', file=sys.stderr)
            return _TUNNEL
        nap = min(60.0, remaining)
        print(f'[bench] degraded tunnel — waiting {nap:.0f}s for a healthy '
              f'window ({remaining / 60:.1f} min left in budget)',
              file=sys.stderr)
        time.sleep(nap)


def _stats(times):
    import statistics
    return {'iters': len(times),
            'wall_s_median': round(statistics.median(times), 3),
            'wall_s_min': round(min(times), 3),
            'wall_s_max': round(max(times), 3)}


def _emit(name: str, audio_seconds: float, times, extra: dict = None):
    """One JSON line: median xRT + min/max spread + tunnel health, so every
    BENCH_r*.json is self-qualifying (VERDICT r3 #6)."""
    import statistics
    med = statistics.median(times)
    payload = {
        'metric': name,
        'value': round(audio_seconds / med, 2),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(audio_seconds / med / BASELINE_XRT, 3),
        'value_min': round(audio_seconds / max(times), 2),
        'value_max': round(audio_seconds / min(times), 2),
        **_stats(times),
        **(_TUNNEL or {}),
    }
    if extra:
        payload.update(extra)
    print(json.dumps(payload))


def main_e2e():
    import numpy as np
    model = build_model()

    audio = synth_speech_like(MINUTES * 60.0)
    audio_seconds = audio.shape[-1] / 16000.0

    # coarse phase breakdown: wall time at the module-function boundaries
    # inside transcribe_batched. The pipeline dispatches decode/timing
    # asynchronously, so launch stages cost ~0 and the *_wait/finish stages
    # show where the host actually blocks; totals are still exact.
    import stable_ts_tpu.batched as batched_mod
    phases = {}

    def instrument_module(name):
        orig = getattr(batched_mod, name)

        def inner(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
            return out
        setattr(batched_mod, name, inner)

    for fn_name in ('log_mel_spectrogram', '_launch_word_timing',
                    '_finish_word_timing'):
        if hasattr(batched_mod, fn_name):
            instrument_module(fn_name)

    def instrument_model(name, phase):
        orig = getattr(model, name)

        def inner(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            phases[phase] = phases.get(phase, 0.0) + time.perf_counter() - t0
            return out
        setattr(model, name, inner)

    instrument_model('embed_audio', 'encode_dispatch')
    instrument_model('decode_launch', 'decode_dispatch')
    instrument_model('decode_collect', 'decode_wait')
    instrument_model('decode', 'decode_fallback')

    # (rows, steps) per decode call, for the HBM-utilization estimate:
    # steps = the while_loop's trip count = the longest row's tokens + 1
    decode_calls = []
    for name in ('decode_collect', 'decode'):
        orig = getattr(model, name)

        def counting(*a, _orig=orig, **kw):
            out = _orig(*a, **kw)
            if out:
                decode_calls.append(
                    (len(out), max(len(r.tokens) for r in out) + 1))
            return out
        setattr(model, name, counting)

    # Random weights produce gibberish that fails the compression-ratio
    # test on EVERY window, so the default fallback ladder would re-decode
    # all audio ~6x — real speech falls back on a few percent of windows.
    # Default to the t=0 pass for a representative number; BENCH_FALLBACK=1
    # measures the full-ladder worst case (same compiled sampler either way).
    temps = ((0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
             if os.environ.get('BENCH_FALLBACK') else (0.0,))

    beam = int(os.environ.get('BENCH_BEAM', '0'))  # 0 = greedy
    extra_kw = {'beam_size': beam} if beam else {}
    _kvq_env = os.environ.get('BENCH_KVQ')
    if _kvq_env is not None:  # unset = model auto (int8 for medium+)
        extra_kw['kv_quant'] = (4 if _kvq_env == '4'
                                else _kvq_env not in ('0', ''))

    def run():
        phases.clear()
        batched_mod.HOST_PHASES.clear()
        result = model.transcribe_batched(
            audio, batch_size=BATCH, language='en', verbose=None,
            temperature=temps, **extra_kw)
        t0 = time.perf_counter()
        srt = result.to_srt_vtt(word_level=True)
        batched_mod.HOST_PHASES['host_render_srt'] = time.perf_counter() - t0
        return result, srt

    _probe_tunnel()
    # warmup: one full run so every program — including the full-length mel
    # jit — compiles before the timed iterations
    t0 = time.perf_counter()
    run()
    print(f'[bench] warmup+compile {time.perf_counter() - t0:.1f}s',
          file=sys.stderr)
    # re-probe after the (possibly minutes-long) compile so the stamped
    # health reflects the timed window, not the pre-warmup state
    _probe_tunnel(refresh=True)

    times = []
    for _ in range(max(2, ITERS)):
        decode_calls.clear()
        t0 = time.perf_counter()
        result, srt = run()
        times.append(time.perf_counter() - t0)

    import statistics
    med = statistics.median(times)
    xrt = audio_seconds / med
    n_words = sum(len(s.words or ()) for s in result.segments)
    print(f'[bench] e2e {audio_seconds:.0f}s audio -> median {med:.2f}s wall '
          f'(min {min(times):.2f} / max {max(times):.2f}, n={len(times)}), '
          f'{len(result.segments)} segments, {n_words} words, '
          f'srt {len(srt)} bytes', file=sys.stderr)
    accounted = sum(phases.values())
    split = ', '.join(f'{k}={v:.2f}s' for k, v in sorted(phases.items()))
    print(f'[bench] phases (last iter): {split}, '
          f'other(host)={times[-1] - accounted:.2f}s', file=sys.stderr)
    # host-side split of that 'other' bucket (VERDICT r4 weak #4): the
    # driver's own accounting of where the host blocks outside the device
    # waits — loader, silence predictor, segmentize, word assembly +
    # suppression, final result build, regroup, SRT render
    host = dict(batched_mod.HOST_PHASES)
    if host:
        hsplit = ', '.join(f'{k}={v:.2f}s' for k, v in sorted(host.items()))
        print(f'[bench] host phases (last iter): {hsplit}, '
              f'sum={sum(host.values()):.2f}s', file=sys.stderr)

    # HBM-utilization estimate for the decode phase (last iteration): an
    # analytic bytes/step model (decoder weights + cross-KV + self-KV
    # streams — the same accounting as BASELINE.md's roofline table)
    # divided by the measured decode wall. Approximate but regression-
    # sensitive: a drop against the ~820 GB/s roofline fraction flags a
    # kernel regression without a manual tools/probe_* session.
    hbm_util = None
    decode_wall = (phases.get('decode_wait', 0.0)
                   + phases.get('decode_fallback', 0.0))
    if decode_calls and decode_wall > 0:
        import jax
        w_bytes = sum(
            x.nbytes for x in jax.tree.leaves(model.params['decoder']))
        dims = model.dims
        d = dims.n_text_state
        cache_len = min(dims.n_text_ctx,
                        ((4 + dims.n_text_ctx // 2 + 128) // 128) * 128)
        kv_item = 1 if dims.n_audio_state >= 1024 else 2  # kv_quant auto
        self_item = 1  # int8 self cache (auto-on with the fused kernel)
        total_bytes = 0
        for rows, steps in decode_calls:
            cross = dims.n_text_layer * rows * 1500 * d * kv_item * 2
            self_kv = dims.n_text_layer * rows * cache_len * (
                d * self_item + 4) * 2
            total_bytes += steps * (w_bytes + cross + self_kv)
        hbm_util = total_bytes / decode_wall / 820e9
        print(f'[bench] decode HBM utilization ~{hbm_util * 100:.0f}% of '
              f'820 GB/s ({total_bytes / 1e9:.0f} GB over {decode_wall:.2f}s '
              f'across {len(decode_calls)} decode calls)', file=sys.stderr)

    # Degraded-tunnel signature (BASELINE.md 2026-08-18): the window upload
    # blocks for multiples of the device decode time. When the mel/upload
    # boundary dwarfs decode_wait the number reflects the transport, not
    # the kernels — flag it (stderr AND machine-readably in the JSON) so a
    # low reading is never misread as a regression.
    mel_s = phases.get('log_mel_spectrogram', 0.0)
    upload_bound = mel_s > 5.0 and mel_s > 2.0 * phases.get('decode_wait', 0.0)
    if upload_bound:
        print('[bench] WARNING: host->device transfer dominates '
              f'(upload-bound {mel_s:.1f}s vs decode '
              f'{phases.get("decode_wait", 0.0):.1f}s) — degraded-tunnel '
              'artifact, see BASELINE.md; value understates the kernels',
              file=sys.stderr)
    extra = {'mel_s': round(mel_s, 2),
             'decode_wait_s': round(phases.get('decode_wait', 0.0), 2)}
    if upload_bound:
        extra['upload_bound'] = True
    if hbm_util is not None:
        extra['decode_hbm_util'] = round(hbm_util, 3)
    _emit(f'xRT_e2e_{MODEL}_b{BATCH}' + (f'_beam{beam}' if beam else ''),
          audio_seconds, times, extra)


def main_kernel():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper.model import (
        ModelDimensions, decoder_apply, decoder_prefill, decoder_step,
        encoder_apply, fuse_self_qkv, init_kv_cache, init_params,
        precompute_cross_kv, precompute_cross_kv_t)
    from stable_ts_tpu.models.whisper.decoding import (_use_cross_kernel,
                                                       _use_int8_self_cache)
    from stable_ts_tpu.models.whisper.timing import build_head_capture_table
    from stable_ts_tpu.models.whisper.alignment_heads import get_alignment_heads

    dims = ModelDimensions(**OPENAI_MODEL_DIMS[MODEL])
    dtype = jnp.bfloat16
    params = init_params(dims, seed=0, dtype=dtype)
    if os.environ.get('BENCH_DQ'):
        from stable_ts_tpu.models.whisper.quantization import quantize_params
        params = quantize_params(params, compute_dtype=dtype)

    mel = jnp.zeros((BATCH, dims.n_mels, 3000), dtype)
    sot = jnp.ones((BATCH, 4), jnp.int32)
    timing_tokens = jnp.ones((BATCH, TOKENS_PER_WINDOW), jnp.int32)

    # KV cache bucketed like the real decode path (decoding.py): the sampler
    # never writes past sot+TOKENS_PER_WINDOW, so no 448-slot cache.
    cache_len = min(dims.n_text_ctx,
                    ((4 + TOKENS_PER_WINDOW + 128) // 128) * 128)

    # Two jits on purpose: the decode phase holds the (L, B, 1500, d)
    # cross-KV; the timing phase holds the (L, B, H, T, 1500) QK capture.
    # Keeping them in one program makes both live at the peak and OOMs
    # large batches.
    _kvq_env = os.environ.get('BENCH_KVQ')
    kvq = (True if _kvq_env is None
           else 4 if _kvq_env == '4'
           else _kvq_env not in ('0', ''))
    fused_cross = _use_cross_kernel()
    int8_self = _use_int8_self_cache()
    heads = get_alignment_heads(MODEL, dims.n_text_layer, dims.n_text_head)
    cap_idx = cap_slots = None
    if heads is not None:
        cap_idx, cap_slots = build_head_capture_table(heads,
                                                      dims.n_text_layer)

    @jax.jit
    def decode_phase(params, mel, sot):
        # mirrors the PRODUCT configuration (decoding.py): fused self-QKV
        # projection, transposed int8 cross-KV through the fused kernel,
        # bucketed cache
        dec = dict(params['decoder'])
        dec['blocks'] = fuse_self_qkv(dec['blocks'])
        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        if fused_cross:
            cross_kv = precompute_cross_kv_t(params['decoder'], xa,
                                             quantize=kvq)
        else:
            cross_kv = precompute_cross_kv(params['decoder'], xa,
                                           quantize=kvq)
        logits, kv = decoder_prefill(params['decoder'], sot, xa,
                                     dims.n_text_head, cache_len,
                                     int8_cache=int8_self)

        def body(i, carry):
            logits, kv = carry
            next_tok = jnp.argmax(logits[:, -1] if logits.ndim == 3 else logits,
                                  axis=-1).astype(jnp.int32)
            logits2, kv = decoder_step(dec, next_tok[:, None],
                                       sot.shape[1] + i, cross_kv, kv,
                                       dims.n_text_head)
            return logits2, kv

        logits, kv = jax.lax.fori_loop(
            0, TOKENS_PER_WINDOW, body, (logits[:, -1], kv))
        return logits.sum(), xa

    @jax.jit
    def timing_phase(params, timing_tokens, xa):
        # teacher-forced with the product's selective-head capture when the
        # canonical alignment heads are known (falls back to all heads)
        t_logits, qks = decoder_apply(params['decoder'], timing_tokens, xa,
                                      dims.n_text_head, capture_qk=True,
                                      capture_index=cap_idx)
        matrix = qks.astype(jnp.float32).mean(axis=(0, 2))
        cost = dtw_cost_pallas(-matrix)
        return t_logits.sum(), cost

    import numpy as np
    from stable_ts_tpu.ops.dtw import dtw_cost_pallas, dtw_jumps_device

    rows_in = jnp.full((BATCH,), TOKENS_PER_WINDOW, jnp.int32)
    cols_in = jnp.full((BATCH,), 1500, jnp.int32)

    def full_step():
        # NOTE: time via host materialization — block_until_ready does not
        # synchronize under the axon remote backend.
        s, xa = decode_phase(params, mel, sot)
        t, cost = timing_phase(params, timing_tokens, xa)
        # device-side traceback, like the product path
        jumps = dtw_jumps_device(cost, rows_in, cols_in)
        float(s); float(t)
        np.asarray(jumps)

    _probe_tunnel()
    full_step()  # warmup/compile
    _probe_tunnel(refresh=True)

    times = []
    for _ in range(max(2, ITERS)):
        t0 = time.perf_counter()
        full_step()
        times.append(time.perf_counter() - t0)

    _emit(f'xRT_{MODEL}_b{BATCH}', BATCH * 30.0, times)


def _bench_loop(run, audio_seconds: float, name: str):
    _probe_tunnel()
    t0 = time.perf_counter()
    run()
    print(f'[bench] warmup+compile {time.perf_counter() - t0:.1f}s',
          file=sys.stderr)
    _probe_tunnel(refresh=True)
    times = []
    for _ in range(max(2, ITERS)):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    print(f'[bench] {name}: {audio_seconds:.0f}s audio -> median '
          f'{sorted(times)[len(times) // 2]:.2f}s wall '
          f'(min {min(times):.2f} / max {max(times):.2f})', file=sys.stderr)
    _emit(name, audio_seconds, times)


def main_align():
    """e2e forced alignment (model.align) — the reference calls align
    "significantly faster than transcribing" (alignment.py:48-49); this
    mode makes that claim measurable on TPU.

    The aligned text is the model's OWN transcript of the audio (the
    product use case: align a known-correct transcript), so the one-pass
    success path dominates — arbitrary text under random weights drives
    the failure/requeue ladder on ~every segment instead, which is a
    worst-case number, not the align number (BENCH_ALIGN_TEXT=dense
    measures that case; align_words mode measures a dense success-path
    workload)."""
    model = build_model()
    minutes = float(os.environ.get('BENCH_MINUTES', '10'))
    audio = synth_speech_like(minutes * 60.0)
    if os.environ.get('BENCH_ALIGN_TEXT') == 'dense':
        # ~2 words/s of short synthetic words (BPE-encodable byte tokens)
        text = ' '.join(f'w{i % 97:02d}' for i in range(int(minutes * 60 * 2)))
    else:
        text = model.transcribe_batched(audio, language='en',
                                        verbose=None).text

    def run():
        return model.align(audio, text, language='en', verbose=None)

    _bench_loop(run, minutes * 60.0, f'xRT_align_{MODEL}')


def main_align_words():
    """e2e align_words: dense word grid with KNOWN segment boundaries — no
    fallback re-decode (the reference calls it "drastically faster",
    alignment.py:235-237). This is the teacher-forced timing machinery at
    a production word density (~2.2 words/s) regardless of what the random
    weights would decode."""
    model = build_model()
    minutes = float(os.environ.get('BENCH_MINUTES', '10'))
    seconds = minutes * 60.0
    audio = synth_speech_like(seconds)
    segs, t, i = [], 0.0, 0
    seg_dur = 10.0
    while t < seconds - 1.0:
        end = min(t + seg_dur, seconds)
        n = int((end - t) * 2.2)
        segs.append(dict(start=round(t, 2), end=round(end, 2),
                         text=' '.join(f'w{(i + j) % 97:02d}'
                                       for j in range(n))))
        i += n
        t = end

    def run():
        return model.align_words(audio, [dict(s) for s in segs],
                                 language='en', verbose=None)

    _bench_loop(run, seconds, f'xRT_align_words_{MODEL}')


def main_refine():
    """e2e timestamp refinement (model.refine) on a synthetic result."""
    import copy
    model = build_model()
    minutes = float(os.environ.get('BENCH_MINUTES', '3'))
    audio = synth_speech_like(minutes * 60.0)
    tokenizer = model.get_tokenizer(language='en', task='transcribe')
    from stable_ts_tpu.result import WhisperResult
    seconds = minutes * 60.0
    words, t, i = [], 0.4, 0
    while t < seconds - 1.0:
        w = f' w{i % 97:02d}'
        words.append(dict(word=w, start=round(t, 2), end=round(t + 0.3, 2),
                          probability=0.8, tokens=tokenizer.encode(w)))
        t += 0.45
        i += 1
    segments = [dict(start=chunk[0]['start'], end=chunk[-1]['end'],
                     text=''.join(w['word'] for w in chunk), words=chunk)
                for chunk in (words[j:j + 12]
                              for j in range(0, len(words), 12))]
    base = WhisperResult(dict(
        text=''.join(w['word'] for w in words), segments=segments,
        language='en'))

    def run():
        return model.refine(audio, copy.deepcopy(base), verbose=None)

    _bench_loop(run, seconds, f'xRT_refine_{MODEL}')


def main_locate():
    """e2e word localization (model.locate, mode 0) — scans the audio in
    chunks with the confirmation decode around each estimate."""
    model = build_model()
    minutes = float(os.environ.get('BENCH_MINUTES', '10'))
    audio = synth_speech_like(minutes * 60.0)

    def run():
        return model.locate(audio, 'w01 w02 w03', language='en', mode=0,
                            count=5, verbose=None)

    _bench_loop(run, minutes * 60.0, f'xRT_locate_{MODEL}')


if __name__ == '__main__':
    _enable_cache()
    {'e2e': main_e2e, 'kernel': main_kernel, 'align': main_align,
     'align_words': main_align_words, 'refine': main_refine,
     'locate': main_locate}[MODE]()
