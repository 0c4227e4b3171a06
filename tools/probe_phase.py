#!/usr/bin/env python
"""Marginal phase split of the FUSED product decode step.

probe_product.py swaps each kernel for its slower fallback; that measures
"kernel vs fallback", not "what the phase costs". This probe SKIPS one
phase at a time (monkeypatched to an output-shaped zero before tracing, so
XLA dead-code-eliminates the phase's weight reads and kernels) and reports
the marginal cost = default - skipped. Data goes garbage, timing doesn't:
the loop runs a fixed ``steps`` count with EOT suppressed.

Phases:
    full        the product _sample_loop (reference point)
    -mlp        decoder MLP matmuls removed
    -cross      cross-attention kernel + projections removed
    -self       self-attention kernel removed (cache writes kept)
    -logits     final vocab projection removed (loop still consumes logits
                shape — replaced by a broadcast)

Run on the real TPU: python tools/probe_phase.py [model] [batch] [steps]
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
import stable_ts_tpu.models.whisper.model as M
from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
from stable_ts_tpu.models.whisper.model import (
    ModelDimensions, decoder_prefill, encoder_apply, fuse_self_qkv,
    init_params, precompute_cross_kv, precompute_cross_kv_t)

phase = os.environ.get('PROBE_SKIP', '')
if phase == 'mlp':
    M._mlp = lambda params, x: jnp.zeros_like(x)
elif phase == 'cross':
    import stable_ts_tpu.ops.cross_attn as CA
    CA.cross_attn_decode = (
        lambda q, kvT, sc, n_head, s=None, q_per_kv=1, layer_idx=0,
        interpret=False: jnp.zeros(q.shape, jnp.float32))
elif phase == 'self':
    import stable_ts_tpu.ops.self_attn as SA
    SA.self_attn_decode = (
        lambda q, kc, vc, layer_idx, pos, n_head, ks=None, vs=None,
        anc=None, q_per_kv=1, ctx_live=None, interpret=False:
        jnp.zeros(q.shape, jnp.float32))
elif phase == 'logits':
    M._vocab_logits = (lambda x, emb:
                       jnp.zeros(x.shape[:-1] + (emb.shape[0],), jnp.float32))

from stable_ts_tpu.models.whisper.decoding import (
    _sample_loop, _use_cross_kernel, _use_int8_self_cache)

model_name, batch, steps = %(model)r, %(batch)d, %(steps)d
dims = ModelDimensions(**OPENAI_MODEL_DIMS[model_name])
params = init_params(dims, seed=0, dtype=jnp.bfloat16)
dec = dict(params['decoder'])
dec['blocks'] = fuse_self_qkv(dec['blocks'])
mel = jnp.zeros((batch, dims.n_mels, 3000), jnp.bfloat16)
xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
if _use_cross_kernel():
    cross_kv = precompute_cross_kv_t(params['decoder'], xa, quantize=True)
else:
    cross_kv = precompute_cross_kv(params['decoder'], xa, quantize=True)
eot = dims.n_vocab - 1537
suppress = np.zeros(dims.n_vocab, np.float32); suppress[eot] = -1e9
blank = np.zeros(dims.n_vocab, np.float32)
cache_len = %(cache)d
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
    n_text_ctx=dims.n_text_ctx, eot=eot, ts_begin=eot + 1 + 1501,
    n_vocab=dims.n_vocab, max_initial_ts_index=-1, suppress_blank=False,
    without_timestamps=True, greedy=True, q_per_kv=1)
out = run(); float(jnp.asarray(out[0]).astype(jnp.float32).sum())
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = run(); float(jnp.asarray(out[0]).astype(jnp.float32).sum())
    best = min(best, time.perf_counter() - t0)
print('RESULT %%8.1f ms total  %%6.2f ms/step'
      %% (best * 1000, best / steps * 1000))
'''


def main(model='large-v3', batch=16, steps=64, cache=128):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = ['', 'mlp', 'cross', 'self', 'logits']
    code = _INNER % dict(repo=repo, model=model, batch=int(batch),
                         steps=int(steps), cache=int(cache))
    base_ms = None
    for phase in configs:
        env = dict(os.environ, PROBE_SKIP=phase)
        r = subprocess.run([sys.executable, '-c', code], env=env,
                           capture_output=True, text=True, timeout=1800)
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith('RESULT')), None)
        label = ('full' if not phase else '-' + phase)
        if line is None:
            print(f'{label:10s} <failed>')
            sys.stderr.write(r.stderr[-2000:] + '\n')
            continue
        ms_step = float(line.split()[-2])
        if base_ms is None:
            base_ms = ms_step
            print(f'{label:10s} {line[7:]}')
        else:
            print(f'{label:10s} {line[7:]}  marginal={base_ms - ms_step:6.2f}'
                  f' ms/step')


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:]]))
