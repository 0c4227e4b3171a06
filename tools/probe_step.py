#!/usr/bin/env python
"""Dissect the per-token decode-step cost in the PRODUCT configuration.

VERDICT r2 #1: decode is ~10 ms/step at large-v3 vs a ~3.6 ms HBM floor.
This probe compiles ablated variants of the decode step loop (full step,
no-cross, no-self, no-MLP, no-logits) and reports the marginal cost of each
phase plus the implied bandwidth, so the roofline section in BASELINE.md is
accounting, not guesswork.

Run on the real TPU: python tools/probe_step.py [model] [batch] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(model_name='large-v3', batch=16, steps=64):
    import jax
    import jax.numpy as jnp
    from stable_ts_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from stable_ts_tpu.models.whisper.load import OPENAI_MODEL_DIMS
    from stable_ts_tpu.models.whisper import model as M
    from stable_ts_tpu.models.whisper.model import (
        ModelDimensions, decoder_prefill, encoder_apply, fuse_self_qkv,
        init_params, layer_norm, linear, precompute_cross_kv_t, _mha, _mlp)
    from functools import partial

    dims = ModelDimensions(**OPENAI_MODEL_DIMS[model_name])
    params = init_params(dims, seed=0, dtype=jnp.bfloat16)
    if os.environ.get('BENCH_DQ'):
        from stable_ts_tpu.models.whisper.quantization import quantize_params
        params = quantize_params(params, compute_dtype=jnp.bfloat16)
    mel = jnp.zeros((batch, dims.n_mels, 3000), jnp.bfloat16)
    sot = jnp.ones((batch, 4), jnp.int32)
    cache_len = 256
    n_head = dims.n_text_head
    d = dims.n_text_state
    n_layers = dims.n_text_layer

    def make_step(use_self=True, use_cross=True, use_mlp=True,
                  use_logits=True, fused_cross=True, self_fa=False):
        """A decoder_step variant with phases ablated (mirrors model.py)."""
        def step(dec, tokens, pos, cross_kv, kv_cache):
            x = dec['token_emb'][tokens] + jax.lax.dynamic_slice_in_dim(
                dec['pos_emb'], pos, 1, axis=0)
            x = x.astype(dec['token_emb'].dtype)
            n_ctx = cache_len
            valid = (jnp.arange(n_ctx)[None, :] <= pos)
            self_mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[None, :]

            def block(carry, scanned):
                h, kc, vc = carry
                layer_params, layer_cross_kv, layer_idx = scanned
                if use_self:
                    q_in = layer_norm(h, layer_params['attn_ln']['g'],
                                      layer_params['attn_ln']['b'])
                    qkv = linear(q_in, layer_params['qkv']['w'],
                                 layer_params['qkv']['b'])
                    q_proj, new_k, new_v = jnp.split(qkv, 3, axis=-1)
                    kc = jax.lax.dynamic_update_slice(
                        kc, new_k[None].astype(kc.dtype), (layer_idx, 0, pos, 0))
                    vc = jax.lax.dynamic_update_slice(
                        vc, new_v[None].astype(vc.dtype), (layer_idx, 0, pos, 0))
                    if self_fa:
                        from stable_ts_tpu.ops.self_attn import self_attn_decode
                        qq = (q_proj[:, 0, :].astype(jnp.float32)
                              * ((d // n_head) ** -0.5))
                        ctx = self_attn_decode(qq, kc, vc, layer_idx, pos,
                                               n_head)
                        attn_out = linear(ctx[:, None, :].astype(h.dtype),
                                          layer_params['attn']['out']['w'],
                                          layer_params['attn']['out']['b'])
                    else:
                        k_cache = jax.lax.dynamic_slice(
                            kc, (layer_idx, 0, 0, 0), (1, batch, n_ctx, d))[0]
                        v_cache = jax.lax.dynamic_slice(
                            vc, (layer_idx, 0, 0, 0), (1, batch, n_ctx, d))[0]
                        attn_out, _, _ = _mha(layer_params['attn'], q_in, None,
                                              n_head, mask=self_mask,
                                              kv_override=(k_cache, v_cache),
                                              q_override=q_proj)
                    h = h + attn_out
                if use_cross:
                    ca_in = layer_norm(h, layer_params['cross_attn_ln']['g'],
                                       layer_params['cross_attn_ln']['b'])
                    ca = layer_params['cross_attn']
                    if fused_cross:
                        from stable_ts_tpu.ops.cross_attn import cross_attn_decode
                        kv_t, sc_t = layer_cross_kv
                        q = linear(ca_in, ca['q']['w'], ca['q']['b'])[:, 0, :]
                        q = q.astype(jnp.float32) * ((d // n_head) ** -0.5)
                        ctx = cross_attn_decode(q, kv_t, sc_t, n_head,
                                                s=cross_kv['s'])
                        cross_out = linear(ctx[:, None, :].astype(h.dtype),
                                           ca['out']['w'], ca['out']['b'])
                    h = h + cross_out
                if use_mlp:
                    h = h + _mlp(layer_params['mlp'],
                                 layer_norm(h, layer_params['mlp_ln']['g'],
                                            layer_params['mlp_ln']['b']))
                return (h, kc, vc), None

            cross_xs = (cross_kv['kvT'], cross_kv['sc'])
            (x, new_k, new_v), _ = jax.lax.scan(
                block, (x, kv_cache['k'], kv_cache['v']),
                (dec['blocks'], cross_xs, jnp.arange(n_layers)))
            x = layer_norm(x, dec['ln']['g'], dec['ln']['b'])
            if use_logits:
                logits = jnp.dot(x[:, 0], dec['token_emb'].T,
                                 preferred_element_type=jnp.float32)
            else:
                logits = jnp.zeros((batch, dims.n_vocab), jnp.float32).at[
                    :, :d].add(x[:, 0].astype(jnp.float32))
            return logits, {'k': new_k, 'v': new_v}
        return step

    @partial(jax.jit, static_argnames=('variant',))
    def run(params, mel, sot, variant='full'):
        kw = dict(
            full=dict(),
            nocross=dict(use_cross=False),
            noself=dict(use_self=False),
            nomlp=dict(use_mlp=False),
            nologits=dict(use_logits=False),
            only_cross=dict(use_self=False, use_mlp=False, use_logits=False),
            fa=dict(self_fa=True),
            fa_nocross=dict(self_fa=True, use_cross=False),
        )[variant]
        step = make_step(**kw)
        dec = dict(params['decoder'])
        dec['blocks'] = fuse_self_qkv(dec['blocks'])
        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        cross_kv = precompute_cross_kv_t(params['decoder'], xa, quantize=True)
        logits, kv = decoder_prefill(params['decoder'], sot, xa,
                                     dims.n_text_head, cache_len)

        def body(i, carry):
            logits, kv = carry
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return step(dec, tok[:, None], 4 + i, cross_kv, kv)

        logits, _ = jax.lax.fori_loop(0, steps, body, (logits[:, -1], kv))
        return logits.sum()

    # also measure prefix cost (encode+precompute+prefill) via a 0-step run
    @jax.jit
    def run_prefix(params, mel, sot):
        xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
        cross_kv = precompute_cross_kv_t(params['decoder'], xa, quantize=True)
        logits, kv = decoder_prefill(params['decoder'], sot, xa,
                                     dims.n_text_head, cache_len)
        return logits.sum() + cross_kv['kvT'].astype(jnp.float32).sum()

    def timeit(fn, *a, **kw):
        float(fn(*a, **kw))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*a, **kw))
            times.append(time.perf_counter() - t0)
        return min(times)

    prefix = timeit(run_prefix, params, mel, sot)
    print(f'prefix (encode+crossKV+prefill): {prefix * 1000:.1f} ms')
    base = None
    variants = (sys.argv[4].split(',') if len(sys.argv) > 4 else
                ('full', 'nocross', 'noself', 'nomlp', 'nologits',
                 'only_cross'))
    for variant in variants:
        t = timeit(run, params, mel, sot, variant=variant)
        per = (t - prefix) / steps * 1000
        msg = f'{variant:10s} total={t * 1000:7.1f} ms  per-step={per:6.2f} ms'
        if variant == 'full':
            base = per
        else:
            msg += f'  marginal={base - per:+6.2f} ms'
        print(msg, flush=True)


if __name__ == '__main__':
    a = sys.argv[1:]
    main(a[0] if a else 'large-v3',
         int(a[1]) if len(a) > 1 else 16,
         int(a[2]) if len(a) > 2 else 64)
