#!/usr/bin/env python
"""Phase split for locate() on the real TPU.

locate (alignment.py:522) alternates two device phases per ~30 s chunk:
  (a) the attention end-estimate — encoder + QK-capture decoder pass +
      softmax/median/argmax;
  (b) the greedy confirmation decode — batch-1 ``decoder_step`` per token
      with a HOST materialization between steps (the forcing/rollback
      logic is data-dependent Python).
This times each building block in isolation, plus the bare host
round-trip of materializing one scalar, so the 600-s BENCH_MODE=locate
wall can be attributed: chunks x (estimate + n_tokens x (step + RTT)).

Run on the real TPU: python tools/probe_locate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from stable_ts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from stable_ts_tpu.models.whisper import OPENAI_MODEL_DIMS, ModelDimensions
    from stable_ts_tpu.models.whisper.model import (
        decoder_apply, decoder_prefill, decoder_step, encoder_apply,
        fuse_self_qkv, init_params, precompute_cross_kv_t)

    model_name = os.environ.get('BENCH_MODEL', 'large-v3')
    dims = ModelDimensions(**OPENAI_MODEL_DIMS[model_name])
    params = init_params(dims, seed=0, dtype=jnp.bfloat16)
    dec = dict(params['decoder'])
    dec['blocks'] = fuse_self_qkv(dec['blocks'])
    mel = jnp.zeros((1, dims.n_mels, 3000), jnp.bfloat16)
    n_text = 12  # initial prompt + a short query

    def timeit(label, fn, reps=20):
        float(np.asarray(fn()).ravel()[0])  # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn()).ravel()[0])  # host materialization sync
            best = min(best, time.perf_counter() - t0)
        print(f'{label:34s} {best * 1000:8.2f} ms')
        return best

    # (a) end-estimate: encode + full-capture decoder pass
    toks = jnp.ones((1, n_text), jnp.int32)

    @jax.jit
    def estimate():
        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        _, qks = decoder_apply(params['decoder'], toks, xa,
                               dims.n_text_head, capture_qk=True)
        w = jax.nn.softmax(qks[:, 0].astype(jnp.float32), axis=-1)
        return w.mean(axis=0)[-1].argmax()

    timeit('estimate (encode+capture+argmax)', estimate, reps=8)

    # (b) one confirmation decoder_step at batch 1 (+ the host sync it pays)
    xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
    cross_kv = precompute_cross_kv_t(params['decoder'], xa)
    cache_len = 128
    logits0, kv0 = decoder_prefill(params['decoder'],
                                   jnp.ones((1, 32), jnp.int32), xa,
                                   dims.n_text_head, cache_len)
    tok = jnp.ones((1, 1), jnp.int32)

    def step():
        logits, _ = decoder_step(dec, tok, jnp.int32(33), cross_kv, kv0,
                                 dims.n_text_head)
        return logits[0, 0]

    timeit('confirm decoder_step b1 (+sync)', step)

    # (c) bucketed re-prefill (rollback cost)
    def prefill():
        logits, _ = decoder_prefill(params['decoder'],
                                    jnp.ones((1, 32), jnp.int32), xa,
                                    dims.n_text_head, cache_len)
        return logits[0, 0, 0]

    timeit('rollback re-prefill (32-bucket)', prefill)

    # (d) bare host round-trip: materialize a device scalar
    one = jnp.float32(1.0) + 0
    timeit('bare host RTT (scalar fetch)', lambda: one * 1.0, reps=50)

    # (e) full-logits transfer the confirm loop actually does
    logits_full, _ = decoder_step(dec, tok, jnp.int32(33), cross_kv, kv0,
                                  dims.n_text_head)

    def fetch_full():
        return np.array(logits_full[0])[0]

    timeit('full (V,) logits row fetch', fetch_full, reps=20)


if __name__ == '__main__':
    main()
