"""Benchmark: transcription throughput (xRT) of Whisper large-v3 on one chip.

Workload per 30-second window (the real per-window cost of stabilized
transcription):
  - encoder forward (1500 positions)
  - KV-cached greedy decode of TOKENS_PER_WINDOW tokens (prefill + steps)
  - one teacher-forced timing pass (the cross-attention word-timestamp
    forward) over the decoded tokens
  - the batched DTW DP (Pallas lockstep kernel) over every window's
    attention matrix + the host traceback of each path

Random weights: identical FLOPs/memory traffic to trained weights; the token
count is fixed (not data-dependent) so the number is workload-honest rather
than gibberish-dependent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): 20x real-time for large-v3 per TPU v5e chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get('BENCH_BATCH', '8'))
TOKENS_PER_WINDOW = int(os.environ.get('BENCH_TOKENS', '224'))
MODEL = os.environ.get('BENCH_MODEL', 'large-v3')
ITERS = int(os.environ.get('BENCH_ITERS', '3'))
BASELINE_XRT = 20.0


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper.model import (
        ModelDimensions, decoder_apply, decoder_prefill, decoder_step,
        encoder_apply, init_kv_cache, init_params, precompute_cross_kv)

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
    cache_len = min(dims.n_text_ctx, ((4 + TOKENS_PER_WINDOW + 64) // 64) * 64)

    # Two jits on purpose: the decode phase holds the (L, B, 1500, d)
    # cross-KV; the timing phase holds the (L, B, H, T, 1500) QK capture.
    # Keeping them in one program makes both live at the peak and OOMs
    # large batches.
    kvq = bool(os.environ.get('BENCH_KVQ'))

    @jax.jit
    def decode_phase(params, mel, sot):
        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        cross_kv = precompute_cross_kv(params['decoder'], xa, quantize=kvq)
        logits, kv = decoder_prefill(params['decoder'], sot, xa,
                                     dims.n_text_head, cache_len)

        def body(i, carry):
            logits, kv = carry
            next_tok = jnp.argmax(logits[:, -1] if logits.ndim == 3 else logits,
                                  axis=-1).astype(jnp.int32)
            logits2, kv = decoder_step(params['decoder'], next_tok[:, None],
                                       sot.shape[1] + i, cross_kv, kv,
                                       dims.n_text_head)
            return logits2, kv

        logits, kv = jax.lax.fori_loop(
            0, TOKENS_PER_WINDOW, body, (logits[:, -1], kv))
        return logits.sum(), xa

    @jax.jit
    def timing_phase(params, timing_tokens, xa):
        # teacher-forced with cross-attention capture; mean over layers/heads
        # stands in for head selection; the DTW input has the real
        # (B, n_tokens, 1500) shape
        t_logits, qks = decoder_apply(params['decoder'], timing_tokens, xa,
                                      dims.n_text_head, capture_qk=True)
        matrix = qks.astype(jnp.float32).mean(axis=(0, 2))
        cost = dtw_cost_pallas(-matrix)
        return t_logits.sum(), cost

    import numpy as np
    from stable_ts_tpu.ops.dtw import dtw_cost_pallas, _traceback_from_cost

    def full_step():
        # NOTE: time via host materialization — block_until_ready does not
        # synchronize under the axon remote backend.
        s, xa = decode_phase(params, mel, sot)
        t, cost = timing_phase(params, timing_tokens, xa)
        float(s); float(t)
        cost_np = np.asarray(cost, dtype=np.float64)
        for b in range(cost_np.shape[0]):
            _traceback_from_cost(cost_np[b])

    full_step()  # warmup/compile

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        full_step()
        times.append(time.perf_counter() - t0)

    best = min(times)
    audio_seconds = BATCH * 30.0
    xrt = audio_seconds / best
    print(json.dumps({
        'metric': f'xRT_{MODEL}_b{BATCH}',
        'value': round(xrt, 2),
        'unit': 'audio_sec/sec/chip',
        'vs_baseline': round(xrt / BASELINE_XRT, 3),
    }))


if __name__ == '__main__':
    main()
