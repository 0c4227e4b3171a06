#!/usr/bin/env python
"""Marginal in-loop cost of the vocab projection, per tiling.

Times the product greedy `_sample_loop` (224 steps, e2e 256-slot config)
once per STABLE_TS_TPU_VOCAB setting in a FRESH subprocess (kernel knobs
are trace-time), so each row is the full step with that vocab-projection
variant. Run on the real TPU: python tools/probe_vocab.py [model] [batch]
"""
import os
import subprocess
import sys

_INNER = r'''
import os, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from stable_ts_tpu.utils import enable_compilation_cache
enable_compilation_cache()
os.environ['BENCH_MODEL'] = %(model)r
import bench as B
from stable_ts_tpu.models.whisper.model import encoder_apply
from stable_ts_tpu.models.whisper.decoding import DecodingOptions

model = B.build_model()
dims = model.dims
mel = jnp.zeros((%(batch)d, dims.n_mels, 3000), jnp.bfloat16)
xa = encoder_apply(model.params['encoder'], mel, dims.n_audio_head)
float(jnp.asarray(xa[0, 0, 0]).astype(jnp.float32))
opts = DecodingOptions(language='en', sample_len=224, temperature=0.0)
r = model.decode(xa, opts)   # compile
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    r = model.decode(xa, opts)
    dt = time.perf_counter() - t0
    best = min(best, dt)
print(f'RESULT {best * 1e3:.1f} ms ({best * 1e3 / 224:.2f} ms/step)')
'''


def main(model='large-v3', batch=16):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    variants = [('xla (VOCAB=0)', {'STABLE_TS_TPU_VOCAB': '0'})]
    for bv in (512, 1024, 2048):
        variants.append((f'kernel bv={bv}',
                         {'STABLE_TS_TPU_VOCAB': 'on',
                          'STABLE_TS_TPU_VOCAB_BV': str(bv)}))
    code = _INNER % {'repo': repo, 'model': model, 'batch': batch}
    for label, env in variants:
        e = dict(os.environ, **env)
        out = subprocess.run([sys.executable, '-c', code], env=e,
                             capture_output=True, text=True, timeout=1200)
        line = [l for l in out.stdout.splitlines() if l.startswith('RESULT')]
        print(f'{label:24s} {line[0][7:] if line else out.stderr[-300:]}')


if __name__ == '__main__':
    main(*(sys.argv[1:2] or ['large-v3']),
         *map(int, sys.argv[2:3] or [16]))
