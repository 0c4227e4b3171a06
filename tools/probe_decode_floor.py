#!/usr/bin/env python
"""Measure per-token decode-step latency across model sizes on the chip.

Explains the kernel-bench model-family curve (BASELINE.md): the decode loop's
per-step wall time has a floor set by per-layer op overheads, so tiny/base
converge to similar step times despite 2x parameter difference.

Run on the real TPU: python tools/probe_decode_floor.py [models...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(model_name: str, batch: int = 8, steps: int = 64):
    import jax
    import jax.numpy as jnp
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper.model import (
        ModelDimensions, decoder_prefill, decoder_step, encoder_apply,
        init_params, precompute_cross_kv)

    dims = ModelDimensions(**OPENAI_MODEL_DIMS[model_name])
    params = init_params(dims, seed=0, dtype=jnp.bfloat16)
    mel = jnp.zeros((batch, dims.n_mels, 3000), jnp.bfloat16)
    sot = jnp.ones((batch, 4), jnp.int32)

    @jax.jit
    def run(params, mel, sot):
        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        cross_kv = precompute_cross_kv(params['decoder'], xa)
        logits, kv = decoder_prefill(params['decoder'], sot, xa,
                                     dims.n_text_head, 256)

        def body(i, carry):
            logits, kv = carry
            tok = jnp.argmax(logits[:, -1] if logits.ndim == 3 else logits,
                             axis=-1).astype(jnp.int32)
            return decoder_step(params['decoder'], tok[:, None], 4 + i,
                                cross_kv, kv, dims.n_text_head)

        logits, _ = jax.lax.fori_loop(0, steps, body, (logits[:, -1], kv))
        return logits.sum()

    float(run(params, mel, sot))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, mel, sot))
        times.append(time.perf_counter() - t0)
    best = min(times)
    per_step_ms = best / steps * 1000
    print(f'{model_name:10s} layers={dims.n_text_layer:2d} width='
          f'{dims.n_text_state:4d} total={best * 1000:7.1f} ms  '
          f'per-step={per_step_ms:6.2f} ms  '
          f'per-layer-step={per_step_ms / dims.n_text_layer * 1000:6.1f} us')


if __name__ == '__main__':
    models = sys.argv[1:] or ['tiny', 'base', 'small', 'medium']
    for m in models:
        probe(m)
