#!/usr/bin/env python
"""Time the PRODUCT beam decode (decode_launch/decode_collect) at e2e shapes.

probe_beam.py times the raw loops at a pinned 64 steps / 128-slot cache /
no timestamp rules; the e2e bench implies a much higher per-step cost.
This probe runs the real entry (cache 256, timestamp grammar, pool exit)
on synthetic features and random weights, ablating one knob at a time, to
locate the difference.

Run on the real TPU: python tools/probe_beam_e2e.py [model] [windows] [beam]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model_name='large-v3', windows=16, beam=5):
    # bench.py freezes BENCH_MODEL at import — set it BEFORE importing
    os.environ['BENCH_MODEL'] = model_name
    import jax.numpy as jnp
    from stable_ts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper.model import (
        ModelDimensions, encoder_apply, init_params)
    from stable_ts_tpu.models.whisper import decoding as D
    from stable_ts_tpu.models.whisper.decoding import DecodingOptions
    import bench as B  # tokenizer-building helper via build_model

    model = B.build_model()
    dims = model.dims
    tokenizer = model.get_tokenizer(language='en', task='transcribe')

    mel = jnp.zeros((windows, dims.n_mels, 3000), jnp.bfloat16)
    xa = encoder_apply(model.params['encoder'], mel, dims.n_audio_head)
    float(jnp.asarray(xa[0, 0, 0]).astype(jnp.float32))  # sync

    def timed(label, **opt_kw):
        opts = DecodingOptions(task='transcribe', language='en',
                               temperature=0.0, **opt_kw)
        pending = D.decode_launch(model.params, dims, tokenizer, xa, opts)
        D.decode_collect(pending)  # compile + drain
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            pending = D.decode_launch(model.params, dims, tokenizer, xa, opts)
            res = D.decode_collect(pending)
            times.append(time.perf_counter() - t0)
        best = min(times)
        ntok = sum(len(r.tokens) for r in res) / len(res)
        print(f'{label:34s} {best * 1000:8.1f} ms  avg_tokens/window={ntok:.1f}')
        return best

    timed('greedy (product default)')
    timed(f'beam{beam} full product', beam_size=beam)
    timed(f'beam{beam} without_timestamps', beam_size=beam,
          without_timestamps=True)
    timed(f'beam{beam} sample_len=64', beam_size=beam, sample_len=64)
    timed(f'beam{beam} sample_len=64 no_ts', beam_size=beam, sample_len=64,
          without_timestamps=True)


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:]]))
