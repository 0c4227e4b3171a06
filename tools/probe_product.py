#!/usr/bin/env python
"""Ablate the PRODUCT decode step by kernel knob (subprocess per config).

probe_step.py dissects a hand-built step composition (the unfused r2
baseline); this probe times the real ``_sample_loop`` — the loop the
product ships — under each kernel environment knob, so the roofline
accounting in BASELINE.md tracks the configuration users actually run:

    default          everything auto (fused self kernel + int8 self-KV,
                     fused cross kernel + int8 cross-KV, bf16 weights)
    self=0           unfused XLA self-attention (dynamic_slice cache copies)
    selfkv=0         fused self kernel, bf16 self-KV rows
    cross=0          unfused XLA cross-attention
    kvq=0            fused cross kernel, bf16 (unquantized) cross-KV

Run on the real TPU: python tools/probe_product.py [model] [batch] [steps]
"""
import os
import subprocess
import sys

_INNER = r'''
import os, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np
from stable_ts_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
from stable_ts_tpu.models.whisper.model import (
    ModelDimensions, decoder_prefill, encoder_apply, fuse_self_qkv,
    init_params, precompute_cross_kv, precompute_cross_kv_t)
from stable_ts_tpu.models.whisper.decoding import (
    _sample_loop, _use_cross_kernel, _use_int8_self_cache)
from stable_ts_tpu.ops.logit_epilogue import _epilogue_mode

model_name, batch, steps = %(model)r, %(batch)d, %(steps)d
_kvq = os.environ.get('PROBE_KVQ', '1')
kvq = 4 if _kvq == '4' else _kvq != '0'
dims = ModelDimensions(**OPENAI_MODEL_DIMS[model_name])
params = init_params(dims, seed=0, dtype=jnp.bfloat16)
dec = dict(params['decoder'])
dec['blocks'] = fuse_self_qkv(dec['blocks'])
mel = jnp.zeros((batch, dims.n_mels, 3000), jnp.bfloat16)
xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
if _use_cross_kernel():
    cross_kv = precompute_cross_kv_t(params['decoder'], xa, quantize=kvq)
else:
    cross_kv = precompute_cross_kv(params['decoder'], xa, quantize=kvq)
with_ts = os.environ.get('PROBE_TS') == '1'
if with_ts:
    # real large-v3 token geometry so the timestamp grammar (the filter
    # chain the fused epilogue removes) runs exactly as in the product
    eot = dims.n_vocab - 1609
    ts_begin = dims.n_vocab - 1501
else:
    eot = dims.n_vocab - 1537
    ts_begin = eot + 1 + 1501
suppress = np.zeros(dims.n_vocab, np.float32); suppress[eot] = -1e9
blank = np.zeros(dims.n_vocab, np.float32)
cache_len = 128
tokens0 = jnp.ones((batch, 4), jnp.int32)
logits, kv = decoder_prefill(params['decoder'], tokens0, xa,
                             dims.n_text_head, cache_len,
                             int8_cache=_use_int8_self_cache())
buf = jax.lax.dynamic_update_slice(
    jnp.zeros((batch, dims.n_text_ctx), jnp.int32), tokens0, (0, 0))
tsm = jnp.zeros((batch, dims.n_vocab), jnp.float32)
rng = jax.random.PRNGKey(0)
run = lambda: _sample_loop(
    dec, cross_kv, kv, logits[:, -1], buf, rng,
    jnp.asarray(suppress), jnp.asarray(blank), tsm,
    n_head=dims.n_text_head, sample_begin=4, sample_len=steps,
    n_text_ctx=dims.n_text_ctx, eot=eot, ts_begin=ts_begin,
    n_vocab=dims.n_vocab,
    max_initial_ts_index=50 if with_ts else -1, suppress_blank=False,
    without_timestamps=not with_ts, greedy=True, q_per_kv=1,
    fused_epilogue=_epilogue_mode())
out = run(); float(jnp.asarray(out[0]).astype(jnp.float32).sum())
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = run(); float(jnp.asarray(out[0]).astype(jnp.float32).sum())
    best = min(best, time.perf_counter() - t0)
print('RESULT %%8.1f ms total  %%6.2f ms/step'
      %% (best * 1000, best / steps * 1000))
'''


def main(model='large-v3', batch=16, steps=64):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = [
        ('default', {}),
        ('self=0', {'STABLE_TS_TPU_SELF': '0'}),
        ('selfkv=0', {'STABLE_TS_TPU_SELFKV': '0'}),
        ('cross=0', {'STABLE_TS_TPU_CROSS': '0'}),
        ('kvq=0', {'PROBE_KVQ': '0'}),
        ('kvq=4', {'PROBE_KVQ': '4'}),
        ('epi=0', {'STABLE_TS_TPU_EPI': '0'}),
    ]
    only = os.environ.get('PROBE_ONLY')  # comma-separated label filter
    if only:
        wanted = set(only.split(','))
        configs = [c for c in configs if c[0] in wanted]
    code = _INNER % dict(repo=repo, model=model, batch=int(batch),
                         steps=int(steps))
    for label, env_over in configs:
        env = dict(os.environ, **env_over)
        r = subprocess.run([sys.executable, '-c', code], env=env,
                           capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith('RESULT')), 'RESULT <failed>')
        print(f'{label:10s} {line[7:]}')
        if 'failed' in line:
            sys.stderr.write(r.stderr[-2000:] + '\n')


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:]]))
