"""Teacher-forced decoder at refine's shapes: flash cross-attention vs the
materializing einsum path. The flash kernel's grid is (b, heads, q-blocks)
with block_b=1 — at L=160 that is 160 tiny grid steps per layer x 32
layers, which may cost more in sequencing than the (B, H, T, 1500) f32
logits the naive path materializes. Patches the kernel gate before the
first trace (trace-time knob), so run in a fresh process.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.environ.setdefault('BENCH_MODEL', 'large-v3')
    import bench
    import jax
    import jax.numpy as jnp
    model = bench.build_model()
    from stable_ts_tpu.models.whisper import model as m

    dims = model.dims
    rng = np.random.default_rng(0)

    for rows in (8, 16):
        xa = jnp.asarray(rng.standard_normal(
            (rows, 1500, dims.n_text_state)) * 0.05, jnp.bfloat16)
        L = 160
        toks = jnp.full((rows, L), 50256, jnp.int32)

        for flash in (True, False):
            m._use_flash_attention_orig = getattr(
                m, '_use_flash_attention_orig', m._use_flash_attention)
            m._use_flash_attention = (m._use_flash_attention_orig if flash
                                      else (lambda: False))

            dec_fn = jax.jit(lambda p, t, x: m.decoder_apply.__wrapped__(
                p, t, x, dims.n_text_head)[0].astype(jnp.float32).sum())
            out = dec_fn(model.params['decoder'], toks, xa)
            float(out)
            t0 = time.perf_counter()
            for _ in range(6):
                float(dec_fn(model.params['decoder'], toks, xa))
            dt = (time.perf_counter() - t0) / 6
            print(f'rows={rows} L={L} flash={flash}: {dt*1e3:.1f}ms',
                  flush=True)


if __name__ == '__main__':
    main()
