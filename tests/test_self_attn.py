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


@pytest.mark.parametrize('gps', ['1', '2'])
@pytest.mark.parametrize('int8', [False, True])
def test_beam_ancestry_matches_gathered_cache(int8, gps, monkeypatch):
    monkeypatch.setenv('STABLE_TS_TPU_BEAM_GPS', gps)
    _check_beam_ancestry(int8)


def _check_beam_ancestry(int8):
    """Ancestry-indirect beam attention == attending a cache physically
    gathered by ancestor: for random valid ancestry tables, running the
    kernel with ``anc`` on the un-gathered cache must match running the
    plain kernel on a cache where row r's position j holds the K/V of
    group row anc[r, j]."""
    from stable_ts_tpu.ops.self_attn import self_attn_decode
    L, groups, g, n_ctx, n_head, dh = 2, 2, 3, 32, 2, 8
    b = groups * g
    d = n_head * dh
    rng = np.random.default_rng(9)
    if int8:
        kc = rng.integers(-127, 128, (L, b, n_ctx, d)).astype(np.int8)
        vc = rng.integers(-127, 128, (L, b, n_ctx, d)).astype(np.int8)
        ks = rng.uniform(0.5, 2.0, (L, b, 1, n_ctx)).astype(np.float32)
        vs = rng.uniform(0.5, 2.0, (L, b, 1, n_ctx)).astype(np.float32)
    else:
        kc = rng.standard_normal((L, b, n_ctx, d)).astype(np.float32)
        vc = rng.standard_normal((L, b, n_ctx, d)).astype(np.float32)
        ks = vs = None
    q = rng.standard_normal((b, d)).astype(np.float32)
    pos = 20
    anc = rng.integers(0, g, (b, n_ctx)).astype(np.int32)
    anc[:, pos] = np.arange(b) % g  # current token: own slot

    def gathered(t):
        grp = t.reshape(L, groups, g, n_ctx, *t.shape[3:])
        idx = anc.reshape(groups, g, n_ctx)
        out = np.empty_like(t)
        for gi in range(groups):
            for r in range(g):
                for j in range(n_ctx):
                    out[:, gi * g + r, j] = grp[:, gi, idx[gi, r, j], j]
        return out

    args = dict(n_head=n_head, interpret=True)
    if int8:
        ks_g = gathered(ks.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)
        vs_g = gathered(vs.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)
        ref = self_attn_decode(jnp.asarray(q), jnp.asarray(gathered(kc)),
                               jnp.asarray(gathered(vc)), 1, pos,
                               ks=jnp.asarray(ks_g), vs=jnp.asarray(vs_g),
                               **args)
        got = self_attn_decode(jnp.asarray(q), jnp.asarray(kc),
                               jnp.asarray(vc), 1, pos,
                               ks=jnp.asarray(ks), vs=jnp.asarray(vs),
                               anc=jnp.asarray(anc), q_per_kv=g, **args)
    else:
        ref = self_attn_decode(jnp.asarray(q), jnp.asarray(gathered(kc)),
                               jnp.asarray(gathered(vc)), 1, pos, **args)
        got = self_attn_decode(jnp.asarray(q), jnp.asarray(kc),
                               jnp.asarray(vc), 1, pos,
                               anc=jnp.asarray(anc), q_per_kv=g, **args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_beam_step_ancestry_matches_gathered_cache(monkeypatch):
    """decoder_step(anc=...) on the beam layout == decoder_step on a cache
    physically reshuffled to the same ancestry, for both the XLA fallback
    and the interpret kernel (the _beam_loop contract: reshuffling the
    ancestry table replaces reshuffling the cache)."""
    from stable_ts_tpu.models.whisper import (init_params,
                                              precompute_cross_kv,
                                              tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import (decoder_prefill,
                                                    decoder_step)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    g, groups = 3, 2
    b = g * groups
    rng = np.random.default_rng(11)
    xa_g = jnp.asarray(rng.standard_normal(
        (groups, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    cross = precompute_cross_kv(params['decoder'], xa_g)
    xa = jnp.repeat(xa_g, g, axis=0)
    tokens0 = jnp.asarray(
        np.repeat(rng.integers(0, dims.n_vocab, (groups, 3)), g, 0),
        jnp.int32)
    _, cache = decoder_prefill(params['decoder'], tokens0, xa,
                               dims.n_text_head, 64)
    # make sibling rows distinct so ancestor selection actually matters
    cache = {key: val + jnp.asarray(
        rng.normal(0, 0.05, val.shape).astype(np.asarray(val).dtype))
        for key, val in cache.items()}
    n_ctx = cache['k'].shape[2]
    pos = int(tokens0.shape[1])
    toks = jnp.asarray(
        np.repeat(rng.integers(0, dims.n_vocab, (groups, 1)), g, 0),
        jnp.int32)

    # a reshuffle: each row adopts a random sibling's prefix
    src_local = rng.integers(0, g, b).astype(np.int32)
    flat_src = (np.arange(b) // g) * g + src_local
    anc = np.broadcast_to(src_local[:, None], (b, n_ctx)).copy()
    anc[:, pos] = np.arange(b) % g
    cache_shuf = {key: jnp.asarray(np.asarray(val)[:, flat_src])
                  for key, val in cache.items()}

    for mode in ('off', 'interpret'):
        monkeypatch.setenv('STABLE_TS_TPU_SELF', mode)
        ref, _ = decoder_step.__wrapped__(params['decoder'], toks,
                                          jnp.int32(pos), cross, cache_shuf,
                                          dims.n_text_head, g, None)
        got, _ = decoder_step.__wrapped__(params['decoder'], toks,
                                          jnp.int32(pos), cross, cache,
                                          dims.n_text_head, g,
                                          jnp.asarray(anc))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)
