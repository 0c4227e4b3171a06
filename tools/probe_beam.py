#!/usr/bin/env python
"""Isolate the beam-search decode cost (VERDICT r2 #2 follow-up).

Times a FIXED 64-step run (EOT suppressed so neither loop exits early) of:
  greedy16  — _sample_loop, 16 rows (the default transcribe config)
  greedy80  — _sample_loop, 80 rows sharing cross-KV 5-way (q_per_kv=5):
              the pure row-scaling cost without any beam bookkeeping
  beam16x5  — _beam_loop, 16 windows x 5 beams = 80 rows
The beam bookkeeping overhead is (beam16x5 - greedy80) and the row-scaling
cost is (greedy80 - greedy16); both per step.

Run on the real TPU: python tools/probe_beam.py [model] [windows] [beam]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model_name='large-v3', windows=16, beam=5, steps=64):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stable_ts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper.model import (
        ModelDimensions, decoder_prefill, encoder_apply, fuse_self_qkv,
        init_params, precompute_cross_kv, precompute_cross_kv_t)
    from stable_ts_tpu.models.whisper.decoding import (
        _beam_loop, _sample_loop, _use_cross_kernel, _use_int8_self_cache)

    dims = ModelDimensions(**OPENAI_MODEL_DIMS[model_name])
    params = init_params(dims, seed=0, dtype=jnp.bfloat16)
    dec = dict(params['decoder'])
    dec['blocks'] = fuse_self_qkv(dec['blocks'])

    mel = jnp.zeros((windows, dims.n_mels, 3000), jnp.bfloat16)
    xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
    if _use_cross_kernel():
        cross_kv = precompute_cross_kv_t(params['decoder'], xa, quantize=True)
    else:
        cross_kv = precompute_cross_kv(params['decoder'], xa, quantize=True)

    eot = dims.n_vocab - 1537  # layout irrelevant for timing; any text id
    ts_begin = eot + 1 + 1501
    sample_begin = 4
    cache_len = 128  # sample_begin + steps + pad, 128-quantum
    suppress = np.zeros(dims.n_vocab, np.float32)
    suppress[eot] = -1e9  # never finish: both loops run all `steps`
    blank = np.zeros(dims.n_vocab, np.float32)
    rng = jax.random.PRNGKey(0)

    def setup(rows_per_window):
        full = windows * rows_per_window
        xa_rep = (jnp.repeat(xa, rows_per_window, axis=0)
                  if rows_per_window > 1 else xa)
        tokens0 = jnp.ones((full, sample_begin), jnp.int32)
        logits, kv = decoder_prefill(params['decoder'], tokens0, xa_rep,
                                     dims.n_text_head, cache_len,
                                     int8_cache=_use_int8_self_cache())
        buf = jnp.zeros((full, dims.n_text_ctx), jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, tokens0, (0, 0))
        ts_mask = jnp.zeros((full, dims.n_vocab), jnp.float32)
        return logits[:, -1], kv, buf, ts_mask

    common = dict(n_head=dims.n_text_head, sample_begin=sample_begin,
                  sample_len=steps, n_text_ctx=dims.n_text_ctx, eot=eot,
                  ts_begin=ts_begin, n_vocab=dims.n_vocab,
                  max_initial_ts_index=-1, suppress_blank=False,
                  without_timestamps=True)

    def timeit(label, fn):
        out = fn()
        float(jnp.asarray(out[0]).astype(jnp.float32).sum())  # compile+sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.asarray(out[0]).astype(jnp.float32).sum())
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f'{label:10s} {best * 1000:8.1f} ms total  '
              f'{best / steps * 1000:6.2f} ms/step')
        return best

    logits16, kv16, buf16, tsm16 = setup(1)
    t_g16 = timeit('greedy16', lambda: _sample_loop(
        dec, cross_kv, kv16, logits16, buf16, rng,
        jnp.asarray(suppress), jnp.asarray(blank), tsm16,
        greedy=True, q_per_kv=1, **common))

    logitsN, kvN, bufN, tsmN = setup(beam)
    t_gN = timeit(f'greedy{windows * beam}', lambda: _sample_loop(
        dec, cross_kv, kvN, logitsN, bufN, rng,
        jnp.asarray(suppress), jnp.asarray(blank), tsmN,
        greedy=True, q_per_kv=beam, **common))

    t_b = timeit(f'beam{windows}x{beam}', lambda: _beam_loop(
        dec, cross_kv, kvN, logitsN, bufN,
        jnp.asarray(suppress), jnp.asarray(blank), tsmN,
        beam_size=beam, max_candidates=beam, **common))

    ms = 1000.0 / steps
    print(f'\nrow-scaling (x{beam} rows): +{(t_gN - t_g16) * ms:6.2f} ms/step')
    print(f'beam bookkeeping:          +{(t_b - t_gN) * ms:6.2f} ms/step')


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:]]))
