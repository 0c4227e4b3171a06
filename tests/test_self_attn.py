"""Fused self-attention decode kernel (ops/self_attn.py): numerics vs the
plain XLA cache path, via the Pallas interpreter on the CPU mesh."""
import numpy as np
import pytest

import jax.numpy as jnp


def _step_logits(dims, params, cache, cross, toks, pos, monkeypatch, mode):
    from stable_ts_tpu.models.whisper.model import decoder_step
    monkeypatch.setenv('STABLE_TS_TPU_SELF', mode)
    out, new_cache = decoder_step.__wrapped__(params['decoder'], toks, pos,
                                             cross, cache, dims.n_text_head,
                                             1)
    return np.asarray(out), new_cache


@pytest.mark.parametrize('batch', [2, 4])
def test_kernel_matches_xla_cache_path(batch, monkeypatch):
    from stable_ts_tpu.models.whisper import (init_params, precompute_cross_kv,
                                              tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import decoder_prefill
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(7)
    xa = jnp.asarray(rng.standard_normal(
        (batch, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    cross = precompute_cross_kv(params['decoder'], xa)
    tokens0 = jnp.asarray(rng.integers(0, dims.n_vocab, (batch, 3)), jnp.int32)
    _, cache = decoder_prefill(params['decoder'], tokens0, xa,
                               dims.n_text_head, 64)

    toks = jnp.asarray(rng.integers(0, dims.n_vocab, (batch, 1)), jnp.int32)
    for step in range(3):
        pos = jnp.int32(3 + step)
        ref, cache_ref = _step_logits(dims, params, cache, cross, toks, pos,
                                      monkeypatch, 'off')
        got, cache = _step_logits(dims, params, cache, cross, toks, pos,
                                  monkeypatch, 'interpret')
        np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
        for key in ('k', 'v'):
            np.testing.assert_allclose(np.asarray(cache[key]),
                                       np.asarray(cache_ref[key]),
                                       rtol=1e-6, atol=1e-6)
        toks = jnp.asarray(ref.argmax(-1)[:, None], jnp.int32)


def test_kernel_masks_future_positions(monkeypatch):
    """Keys past ``pos`` must not leak into the softmax: garbage planted in
    future cache slots cannot change the output."""
    from stable_ts_tpu.ops.self_attn import self_attn_decode
    L, b, n_ctx, n_head, dh = 2, 2, 32, 2, 8
    d = n_head * dh
    rng = np.random.default_rng(8)
    kc = rng.standard_normal((L, b, n_ctx, d)).astype(np.float32)
    vc = rng.standard_normal((L, b, n_ctx, d)).astype(np.float32)
    q = rng.standard_normal((b, d)).astype(np.float32)
    pos = 5
    out = np.asarray(self_attn_decode(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), 1, pos, n_head,
        interpret=True))
    kc2, vc2 = kc.copy(), vc.copy()
    kc2[:, :, pos + 1:] = 1e6
    vc2[:, :, pos + 1:] = -1e6
    out2 = np.asarray(self_attn_decode(
        jnp.asarray(q), jnp.asarray(kc2), jnp.asarray(vc2), 1, pos, n_head,
        interpret=True))
    np.testing.assert_allclose(out2, out, rtol=1e-6, atol=1e-6)

    # and the layer scalar selects the right slab
    out_l0 = np.asarray(self_attn_decode(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), 0, pos, n_head,
        interpret=True))
    assert not np.allclose(out_l0, out)
