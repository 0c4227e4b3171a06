"""Fused cross-attention decode kernel (ops/cross_attn.py): numerics vs the
naive per-head attention, and decoder_step equivalence between the fused
(transposed-KV) and unfused (legacy-KV) paths — via the Pallas interpreter
on the CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_ts_tpu.ops.cross_attn import _S_CHUNK, cross_attn_decode


def _naive(q, k, v, n_head):
    b, s, d = k.shape
    dh = d // n_head
    scale = dh ** -0.5
    qh = q.reshape(b, n_head, dh)
    kh = k.reshape(b, s, n_head, dh)
    vh = v.reshape(b, s, n_head, dh)
    lg = np.einsum('bhd,bshd->bhs', qh * scale, kh)
    w = np.exp(lg - lg.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    return np.einsum('bhs,bshd->bhd', w, vh).reshape(b, d)


def _to_kernel_layout(x, s_pad, quantize=False, bits=8):
    b, s, d = x.shape
    if quantize:
        qmax = float(2 ** (bits - 1) - 1)
        amax = np.abs(x).max(-1, keepdims=True)
        sc = np.where(amax > 0, amax / qmax, 1.0)
        xq = np.clip(np.round(x / sc), -qmax, qmax).astype(np.int8)
        deq = xq * sc
    else:
        sc = np.ones((b, s, 1), np.float32)
        xq, deq = x, x
    xt = np.zeros((b, d, s_pad), xq.dtype)
    xt[:, :, :s] = xq.transpose(0, 2, 1)
    if quantize and bits == 4:
        # split-half nibble packing (model.py:precompute_cross_kv_t):
        # packed row r = dim r in the low nibble, dim r + d/2 in the high
        lo, hi = xt[:, :d // 2], xt[:, d // 2:]
        xt = ((hi.astype(np.int8) << 4)
              | (lo.astype(np.int8) & np.int8(0xF))).astype(np.int8)
    st = np.ones((b, 1, s_pad), np.float32)
    st[:, 0, :s] = sc[:, :, 0]
    return xt, st, deq


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv('STABLE_TS_TPU_CROSS', 'interpret')


@pytest.mark.parametrize('quantize', [False, True])
@pytest.mark.parametrize('s', [100, 700])
def test_kernel_matches_naive_attention(quantize, s):
    b, n_head, dh = 2, 4, 64
    d = n_head * dh
    s_pad = (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    kt, ks, kdq = _to_kernel_layout(k, s_pad, quantize)
    vt, vs, vdq = _to_kernel_layout(v, s_pad, quantize)
    got = np.asarray(cross_attn_decode(
        jnp.asarray(q * dh ** -0.5), jnp.asarray(np.stack([kt, vt], 1)),
        jnp.asarray(np.stack([ks, vs], 1)), n_head=n_head, s=s))
    ref = _naive(q, kdq.astype(np.float32), vdq.astype(np.float32), n_head)
    # kernel operands ride the MXU as bf16 (same precision as the model's
    # own bf16 attention einsums) — tolerance is bf16-scale, not f32
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


def test_decoder_step_fused_equals_legacy():
    from stable_ts_tpu.models.whisper import (
        init_kv_cache, init_params, precompute_cross_kv, tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import (decoder_step,
                                                    precompute_cross_kv_t)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    b = 2
    rng = np.random.default_rng(1)
    xa = jnp.asarray(rng.standard_normal(
        (b, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    legacy = precompute_cross_kv(params['decoder'], xa)
    fused = precompute_cross_kv_t(params['decoder'], xa)
    cache = init_kv_cache(dims, b)
    toks = jnp.asarray(rng.integers(0, dims.n_vocab, (b, 1)), jnp.int32)
    pos = jnp.int32(0)
    lg_legacy, _ = decoder_step(params['decoder'], toks, pos, legacy, cache,
                                dims.n_text_head)
    lg_fused, _ = decoder_step(params['decoder'], toks, pos, fused, cache,
                               dims.n_text_head)
    np.testing.assert_allclose(np.asarray(lg_fused), np.asarray(lg_legacy),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('s', [100, 700])
def test_kernel_int4_matches_naive_on_its_grid(s):
    """Packed int4 tiles through the kernel == naive f32 attention over the
    DEQUANTIZED int4 values (grid equivalence at bf16 tolerance — isolates
    the pack/unpack plumbing from the quantization error itself)."""
    b, n_head, dh = 2, 4, 64
    d = n_head * dh
    s_pad = (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK
    rng = np.random.default_rng(7)
    q = rng.standard_normal((b, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    kt, ks, kdq = _to_kernel_layout(k, s_pad, quantize=True, bits=4)
    vt, vs, vdq = _to_kernel_layout(v, s_pad, quantize=True, bits=4)
    assert kt.shape == (b, d // 2, s_pad)  # half-height packed tiles
    got = np.asarray(cross_attn_decode(
        jnp.asarray(q * dh ** -0.5), jnp.asarray(np.stack([kt, vt], 1)),
        jnp.asarray(np.stack([ks, vs], 1)), n_head=n_head, s=s, bits=4))
    ref = _naive(q, kdq.astype(np.float32), vdq.astype(np.float32), n_head)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)


def test_bits_shape_mismatch_rejected():
    """An explicit bits flag that disagrees with the tile shapes must raise,
    not silently misdecode (ADVICE r4: no shape-inferred nibble dispatch)."""
    b, n_head, dh, s = 1, 4, 64, 100
    d = n_head * dh
    s_pad = (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    kt, ks, _ = _to_kernel_layout(k, s_pad, quantize=True, bits=4)
    kv4 = jnp.asarray(np.stack([kt, kt], 1))     # half-height packed tiles
    sc = jnp.asarray(np.stack([ks, ks], 1))
    with pytest.raises(ValueError):              # packed tiles, bits=8
        cross_attn_decode(q, kv4, sc, n_head=n_head, s=s)
    kt8, ks8, _ = _to_kernel_layout(k, s_pad, quantize=True, bits=8)
    kv8 = jnp.asarray(np.stack([kt8, kt8], 1))
    sc8 = jnp.asarray(np.stack([ks8, ks8], 1))
    with pytest.raises(ValueError):              # full tiles, bits=4
        cross_attn_decode(q, kv8, sc8, n_head=n_head, s=s, bits=4)


def test_int4_pack_matches_unfused_grid():
    """precompute_cross_kv_t(quantize=4)'s packed nibbles decode to exactly
    the unpacked int4 grid precompute_cross_kv(quantize=4) stores — the two
    paths share one quantization, differing only in layout."""
    from stable_ts_tpu.models.whisper import init_params, tiny_test_dims
    from stable_ts_tpu.models.whisper.model import (precompute_cross_kv,
                                                    precompute_cross_kv_t)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    rng = np.random.default_rng(8)
    xa = jnp.asarray(rng.standard_normal(
        (2, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    legacy = precompute_cross_kv(params['decoder'], xa, quantize=4)
    fused = precompute_cross_kv_t(params['decoder'], xa, quantize=4)
    p = np.asarray(fused['kvT4']).astype(np.int32)      # (L, B, 2, d/2, S)
    lo = (p << 28) >> 28
    hi = p >> 4
    unpacked = np.concatenate([lo, hi], axis=3)         # (L, B, 2, d, S)
    s = dims.n_audio_ctx
    for idx, key in ((0, 'k'), (1, 'v')):
        want = np.asarray(legacy[key].q).transpose(0, 1, 3, 2)  # (L,B,d,s)
        np.testing.assert_array_equal(unpacked[:, :, idx, :, :s], want)
        want_sc = np.asarray(legacy[key].scale)[..., 0]          # (L,B,s)
        np.testing.assert_allclose(
            np.asarray(fused['sc'])[:, :, idx, 0, :s], want_sc, rtol=1e-6)


def test_decoder_step_int4_quantized_close():
    """kv_quant=4 end through decoder_step: logits stay within int4-scale
    error of the float path (looser than int8's bound — 15 levels/position)."""
    from stable_ts_tpu.models.whisper import (
        init_kv_cache, init_params, tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import (decoder_step,
                                                    precompute_cross_kv,
                                                    precompute_cross_kv_t)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    b = 2
    rng = np.random.default_rng(9)
    xa = jnp.asarray(rng.standard_normal(
        (b, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    ref = precompute_cross_kv(params['decoder'], xa)          # float legacy
    fused = precompute_cross_kv_t(params['decoder'], xa, quantize=4)
    assert fused['kvT4'].shape[-2] == dims.n_audio_state // 2
    cache = init_kv_cache(dims, b)
    toks = jnp.asarray(rng.integers(0, dims.n_vocab, (b, 1)), jnp.int32)
    pos = jnp.int32(0)
    lg_ref, _ = decoder_step(params['decoder'], toks, pos, ref, cache,
                             dims.n_text_head)
    lg_q, _ = decoder_step(params['decoder'], toks, pos, fused, cache,
                           dims.n_text_head)
    assert float(jnp.mean(jnp.abs(lg_q - lg_ref))) < 0.25 * float(
        jnp.std(lg_ref))


def test_decoder_step_fused_quantized_close():
    from stable_ts_tpu.models.whisper import (
        init_kv_cache, init_params, tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import (decoder_step,
                                                    precompute_cross_kv,
                                                    precompute_cross_kv_t)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    b = 2
    rng = np.random.default_rng(2)
    xa = jnp.asarray(rng.standard_normal(
        (b, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    ref = precompute_cross_kv(params['decoder'], xa)          # float legacy
    fused = precompute_cross_kv_t(params['decoder'], xa, quantize=True)
    cache = init_kv_cache(dims, b)
    toks = jnp.asarray(rng.integers(0, dims.n_vocab, (b, 1)), jnp.int32)
    pos = jnp.int32(0)
    lg_ref, _ = decoder_step(params['decoder'], toks, pos, ref, cache,
                             dims.n_text_head)
    lg_q, _ = decoder_step(params['decoder'], toks, pos, fused, cache,
                           dims.n_text_head)
    # int8 KV error bound: logits stay close enough that argmax is stable
    # on a non-degenerate distribution
    assert float(jnp.mean(jnp.abs(lg_q - lg_ref))) < 0.05 * float(
        jnp.std(lg_ref))


def test_decoder_step_int8_self_cache_close():
    """Row-major int8 self-KV cache vs the bf16 cache path: logits must
    stay within dynamic-int8 error across several sequential steps
    (exercises the per-step row+scale updates and the dequantizing read,
    on both the XLA fallback and the fused-kernel interpret path)."""
    import os
    from stable_ts_tpu.models.whisper import (
        init_kv_cache, init_params, tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import (decoder_prefill,
                                                    decoder_step,
                                                    precompute_cross_kv)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    b, n_tok, cache_len = 2, 4, 128
    rng = np.random.default_rng(3)
    xa = jnp.asarray(rng.standard_normal(
        (b, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    tokens0 = jnp.asarray(rng.integers(0, dims.n_vocab, (b, n_tok)),
                          jnp.int32)
    cross = precompute_cross_kv(params['decoder'], xa)

    lg_ref, cache_ref = decoder_prefill(params['decoder'], tokens0, xa,
                                        dims.n_text_head, cache_len)
    lg_f, cache_f = decoder_prefill(params['decoder'], tokens0, xa,
                                    dims.n_text_head, cache_len,
                                    int8_cache=True)
    assert set(cache_f) == {'k', 'ks', 'v', 'vs'}
    assert cache_f['k'].dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(lg_f), np.asarray(lg_ref),
                               rtol=1e-4, atol=1e-4)

    for mode in ('off', 'interpret'):
        os.environ['STABLE_TS_TPU_SELF'] = mode
        try:
            c_ref, c_q = cache_ref, cache_f
            tok = jnp.asarray(rng.integers(0, dims.n_vocab, (b, 1)),
                              jnp.int32)
            for step in range(3):
                pos = jnp.int32(n_tok + step)
                out_ref, c_ref = decoder_step.__wrapped__(
                    params['decoder'], tok, pos, cross, c_ref,
                    dims.n_text_head, 1)
                out_q, c_q = decoder_step.__wrapped__(
                    params['decoder'], tok, pos, cross, c_q,
                    dims.n_text_head, 1)
                ref = np.asarray(out_ref)
                diff = np.abs(np.asarray(out_q) - ref)
                assert diff.mean() < 0.05 * ref.std(), \
                    (mode, step, diff.mean(), ref.std())
                tok = jnp.asarray(ref.argmax(-1)[:, None], jnp.int32)
        finally:
            os.environ.pop('STABLE_TS_TPU_SELF', None)


@pytest.mark.parametrize('quantize', [False, True])
def test_kernel_q_per_kv_matches_repeated_kv(quantize):
    """g query rows per KV row (beam sharing) == running the kernel with the
    KV physically repeated g times."""
    b, g, n_head, dh, s = 2, 3, 4, 64, 300
    d = n_head * dh
    s_pad = (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK
    rng = np.random.default_rng(4)
    q = rng.standard_normal((b * g, d)).astype(np.float32) * 0.3
    k = rng.standard_normal((b, s, d)).astype(np.float32)
    v = rng.standard_normal((b, s, d)).astype(np.float32)
    kt, ks, _ = _to_kernel_layout(k, s_pad, quantize)
    vt, vs, _ = _to_kernel_layout(v, s_pad, quantize)
    kv = np.stack([kt, vt], 1)
    sc = np.stack([ks, vs], 1)

    shared = np.asarray(cross_attn_decode(
        jnp.asarray(q * dh ** -0.5), jnp.asarray(kv), jnp.asarray(sc),
        n_head=n_head, s=s, q_per_kv=g))
    rep = lambda x: jnp.asarray(np.repeat(x, g, axis=0))
    repeated = np.asarray(cross_attn_decode(
        jnp.asarray(q * dh ** -0.5), rep(kv), rep(sc), n_head=n_head, s=s))
    np.testing.assert_allclose(shared, repeated, rtol=1e-5, atol=1e-5)


def test_decoder_step_q_per_kv_matches_repeated_kv():
    """decoder_step with per-group cross-KV (q_per_kv=g, the beam layout)
    == decoder_step with the cross-KV repeated per beam, on both the
    unfused einsum path and the fused kernel path."""
    from stable_ts_tpu.models.whisper import (
        init_kv_cache, init_params, precompute_cross_kv, tiny_test_dims)
    from stable_ts_tpu.models.whisper.model import (decoder_step,
                                                    precompute_cross_kv_t)
    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    b, g = 2, 3
    rows = b * g
    rng = np.random.default_rng(5)
    xa = jnp.asarray(rng.standard_normal(
        (b, dims.n_audio_ctx, dims.n_audio_state)).astype(np.float32))
    xa_rep = jnp.repeat(xa, g, axis=0)
    cache = init_kv_cache(dims, rows)
    toks = jnp.asarray(rng.integers(0, dims.n_vocab, (rows, 1)), jnp.int32)
    pos = jnp.int32(0)

    ref, _ = decoder_step(params['decoder'], toks, pos,
                          precompute_cross_kv(params['decoder'], xa_rep),
                          cache, dims.n_text_head)
    shared, _ = decoder_step(params['decoder'], toks, pos,
                             precompute_cross_kv(params['decoder'], xa),
                             cache, dims.n_text_head, q_per_kv=g)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    fused_shared, _ = decoder_step(
        params['decoder'], toks, pos,
        precompute_cross_kv_t(params['decoder'], xa), cache,
        dims.n_text_head, q_per_kv=g)
    np.testing.assert_allclose(np.asarray(fused_shared), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
