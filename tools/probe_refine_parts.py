"""Component timing of the fused refine round program on the real TPU:
masked-mel prologue vs encoder vs decoder+rank epilogue, at row counts
8 and 16 — locates the fused round's 270 ms (only ~55 TFLOP/s at 8 rows)
and tests whether one 16-row dispatch beats two 8-row dispatches (the
pipeline split's host overlap now hides ~3 ms of host work per round,
so fatter batches may win outright).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    # materialize ONE element (device-side ravel, 4-byte download) — a full
    # np.asarray would drag the whole tensor over the tunnel and time the
    # link, not the kernel
    arr = out[0] if isinstance(out, tuple) else out
    return float(arr.ravel()[0].astype('float32'))


def bench_fn(fn, *args, iters=6):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    os.environ.setdefault('BENCH_MODEL', 'large-v3')
    import bench
    import jax
    import jax.numpy as jnp
    from functools import partial
    model = bench.build_model()
    from stable_ts_tpu.models.whisper.model import encoder_apply, decoder_apply
    from stable_ts_tpu import alignment as al

    dims = model.dims
    rng = np.random.default_rng(0)

    for rows in (8, 16):
        t_bucket = 30 * 16000 + 8000
        clean = jnp.asarray(rng.standard_normal(
            (rows // 2, t_bucket), dtype=np.float32) * 0.05)
        t_real = jnp.full((rows // 2,), 30 * 16000, jnp.int32)
        slots = jnp.arange(rows // 2, dtype=jnp.int32)
        w_b = 64
        lo = jnp.zeros((rows, w_b), jnp.int32)
        hi = jnp.zeros((rows, w_b), jnp.int32)
        L = 160
        toks = jnp.full((rows, L), 50256, jnp.int32)

        mel_fn = jax.jit(partial(al._masked_mel_body, n_mels=dims.n_mels))
        mel = mel_fn(clean[slots], t_real[slots], lo, hi)
        t_mel = bench_fn(lambda c, tr, l, h: mel_fn(c[slots], tr[slots], l, h),
                         clean, t_real, lo, hi)

        enc_fn = jax.jit(partial(encoder_apply,
                                 n_head=dims.n_audio_head))
        xa = enc_fn(model.params['encoder'], mel)
        t_enc = bench_fn(enc_fn, model.params['encoder'], mel)

        # full .sum() so XLA cannot narrow the vocab matmul to a slice
        dec_fn = jax.jit(lambda p, t, x: decoder_apply(
            p, t, x, dims.n_text_head)[0].astype(jnp.float32).sum())
        t_dec = bench_fn(dec_fn, model.params['decoder'], toks, xa)

        full = bench_fn(
            lambda c, tr, l, h, t: al._refine_round_fused(
                model, c, tr, slots, l, h, t, 50256),
            clean, t_real, lo, hi, toks)

        tf = rows * 2.25
        print(f'rows={rows}: mel {t_mel*1e3:.1f}ms  enc {t_enc*1e3:.1f}ms '
              f'({tf / t_enc:.0f} TF/s)  dec+logits {t_dec*1e3:.1f}ms  '
              f'fused(full) {full*1e3:.1f}ms', flush=True)


if __name__ == '__main__':
    main()
