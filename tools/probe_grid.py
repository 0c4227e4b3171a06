#!/usr/bin/env python
"""Isolate Pallas per-grid-step overhead on the tunneled v5e.

The cross decode kernel's r2 accounting blamed ~5 us per grid step
(16 windows x 32 layers = 2.5 ms/token-step) of sequencing overhead.
Before redesigning operand layouts, measure what that overhead is made
of: this times a minimal streaming kernel over a fixed total byte volume
while varying (a) the number of grid steps and (b) the number of operand
refs per step.

Each config streams the SAME 128 MB total; differences are pure per-step
cost. An on-device fori_loop of 32 reps amortizes the host sync.

Run on the real TPU: python tools/probe_grid.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from stable_ts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    total_mb = 128
    d = 1024

    def build(n_steps: int, n_ops: int):
        """n_ops operands, each (n_steps, rows, d) int8; one grid axis."""
        rows = total_mb * 2 ** 20 // (n_steps * d * n_ops)

        def kern(*refs):
            out = refs[-1]
            acc = jnp.zeros((1, d), jnp.float32)
            for r in refs[:-1]:
                acc = acc + jnp.sum(r[0].astype(jnp.float32), axis=0,
                                    keepdims=True)
            out[0] = acc

        spec = pl.BlockSpec((1, rows, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        ops = [jnp.ones((n_steps, rows, d), jnp.int8) for _ in range(n_ops)]
        call = pl.pallas_call(
            kern, grid=(n_steps,),
            in_specs=[spec] * n_ops,
            out_specs=pl.BlockSpec((1, d), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, d), jnp.float32),
        )

        @jax.jit
        def run():
            def body(_, acc):
                return acc + call(*ops)[0, 0]
            return jax.lax.fori_loop(0, 32, body, jnp.float32(0.0))

        return run

    print(f'streaming {total_mb} MB int8 per launch, 32 launches per timing')
    floor_ms = total_mb / 820e3 * 1000
    print(f'HBM floor per launch ~{floor_ms:.3f} ms\n')
    for n_steps in (16, 32, 64, 128, 256):
        for n_ops in (1, 2, 4):
            run = build(n_steps, n_ops)
            float(run())  # compile + sync
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run())
                best = min(best, time.perf_counter() - t0)
            per_launch = best / 32 * 1000
            over = (per_launch - floor_ms) * 1000 / n_steps
            print(f'steps={n_steps:4d} ops={n_ops}  '
                  f'{per_launch:7.3f} ms/launch  '
                  f'overhead/step={over:6.2f} us')


if __name__ == '__main__':
    main()
