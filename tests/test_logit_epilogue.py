"""Fused vocab+filter epilogue (ops/logit_epilogue.py): the aggregates it
streams out of the embedding walk must reproduce exactly what the unfused
greedy loop computed from full (B, V) logits — filter chain (reference
stable_whisper/decode.py:14-54 + whisper ApplyTimestampRules semantics),
force-timestamp rule, argmax tie-breaking, and token logprobs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stable_ts_tpu.ops.logit_epilogue import (
    fused_logit_aggregates, logit_aggregates_xla,
    prepare_epilogue_operands, select_from_aggregates)

V, D, TS_BEGIN, EOT = 1900, 256, 1500, 1400
NEG = -1e9


def _filters_ref(logits, suppress, ts_sil, flags, with_grammar=True):
    """NumPy twin of the in-loop (i >= 1) filter semantics
    (decoding.apply_filters minus the i == 0 branches)."""
    f = logits + suppress[None, :] + ts_sil
    if not with_grammar:
        return f
    ids = np.arange(logits.shape[1])
    text_ban, ts_ban, has_ts, floor = (flags[0] > 0, flags[1] > 0,
                                       flags[2] > 0, flags[3])
    f = np.where(ts_ban[:, None] & (ids >= TS_BEGIN)[None, :], NEG, f)
    f = np.where(text_ban[:, None] & (ids < EOT)[None, :], NEG, f)
    below = ids[None, :] < (TS_BEGIN + floor)[:, None]
    f = np.where(has_ts[:, None] & (ids >= TS_BEGIN)[None, :] & below, NEG, f)
    return f


def _rand_case(seed, b=5):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, D)).astype(np.float32) * 0.2
    emb = rng.standard_normal((V, D)).astype(np.float32) * 0.2
    suppress = np.where(rng.random(V) < 0.05, NEG, 0.0).astype(np.float32)
    ts_sil = np.zeros((b, V), np.float32)
    sil = rng.random((b, V - TS_BEGIN)) < 0.3
    ts_sil[:, TS_BEGIN:] = np.where(sil, NEG, 0.0)
    flags = np.stack([
        (rng.random(b) < 0.4), (rng.random(b) < 0.4),
        (rng.random(b) < 0.6),
        rng.integers(0, (V - TS_BEGIN) // 2, b)]).astype(np.float32)
    # a row can't be both bans at once (they're derived from disjoint
    # last/penult states) — keep the case realistic
    flags[1] = np.where(flags[0] > 0, 0.0, flags[1])
    return x, emb, suppress, ts_sil, flags


@pytest.mark.parametrize('with_grammar', [True, False])
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_kernel_matches_xla_reference(seed, with_grammar):
    x, emb, suppress, ts_sil, flags = _rand_case(seed)
    # f32 operands on both paths (the product path feeds bf16 into the MXU,
    # but equivalence is about the reduction plumbing, not matmul rounding)
    logits = (x @ emb.T).astype(np.float32)
    ref = np.asarray(logit_aggregates_xla(
        jnp.asarray(_filters_ref(logits, suppress, ts_sil, flags,
                                 with_grammar)), TS_BEGIN))

    prepared = prepare_epilogue_operands(
        jnp.asarray(emb, jnp.float32), jnp.asarray(suppress),
        jnp.asarray(ts_sil), ts_begin=TS_BEGIN, block_v=512)
    got = np.asarray(fused_logit_aggregates(
        jnp.asarray(x), prepared, jnp.asarray(flags), ts_begin=TS_BEGIN,
        eot=EOT, with_grammar=with_grammar, interpret=True))

    # argmax indices: exact; max values: fp-tolerance; sumexp: relative
    np.testing.assert_array_equal(got[:, 1], ref[:, 1])
    np.testing.assert_array_equal(got[:, 4], ref[:, 4])
    np.testing.assert_allclose(got[:, [0, 3]], ref[:, [0, 3]],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[:, [2, 5]], ref[:, [2, 5]],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('seed', [3, 4, 5, 6])
def test_selection_matches_unfused_math(seed):
    """select_from_aggregates == argmax + log_softmax gather over the
    filtered logits, including the force-timestamp rule."""
    x, emb, suppress, ts_sil, flags = _rand_case(seed, b=7)
    logits = (x @ emb.T).astype(np.float32)
    f = _filters_ref(logits, suppress, ts_sil, flags)
    ids = np.arange(V)
    is_ts = ids >= TS_BEGIN

    # unfused twin (decoding.apply_filters tail + body selection)
    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(f), axis=-1))
    lse_ts = np.asarray(jax.nn.logsumexp(
        jnp.where(jnp.asarray(is_ts)[None, :], jnp.asarray(logprobs), NEG),
        axis=-1))
    max_text = np.max(np.where(is_ts[None, :], NEG, logprobs), axis=-1)
    force = lse_ts > max_text
    f2 = np.where(force[:, None] & ~is_ts[None, :], NEG, f)
    want_tok = np.argmax(f2, axis=-1)
    want_lp = np.take_along_axis(
        np.asarray(jax.nn.log_softmax(jnp.asarray(f2), axis=-1)),
        want_tok[:, None], axis=-1)[:, 0]

    agg = logit_aggregates_xla(jnp.asarray(f), TS_BEGIN)
    got_tok, got_lp = select_from_aggregates(agg)
    np.testing.assert_array_equal(np.asarray(got_tok), want_tok)
    np.testing.assert_allclose(np.asarray(got_lp), want_lp,
                               rtol=1e-4, atol=1e-4)


class TestLoopEquivalence:
    """Full greedy decode: fused epilogue (interpret) vs the unfused loop
    on a tiny model — identical token sequences, matching logprobs."""

    @pytest.mark.parametrize('ts_silence', [False, True])
    @pytest.mark.parametrize('without_timestamps', [False, True])
    def test_decode_paths_agree(self, monkeypatch, without_timestamps,
                                ts_silence):
        from stable_ts_tpu.models.whisper import (init_params,
                                                  tiny_test_dims)
        from stable_ts_tpu.models.whisper.decoding import (DecodingOptions,
                                                           decode)
        from stable_ts_tpu.models.whisper.tokenizer import get_tokenizer
        dims = tiny_test_dims()
        params = init_params(dims, seed=0)
        tokenizer = get_tokenizer(
            multilingual=True, num_languages=99, language='en',
            task='transcribe')
        rng = np.random.default_rng(11)
        mel = jnp.asarray(
            rng.standard_normal((3, dims.n_mels, 3000)).astype(np.float32))
        opts = DecodingOptions(temperature=0.0, sample_len=24,
                               without_timestamps=without_timestamps)
        mask = None
        if ts_silence:
            sm = rng.random((3, 1501)) < 0.4
            mask = sm

        monkeypatch.setenv('STABLE_TS_TPU_EPI', '0')
        base = decode(params, dims, tokenizer, mel, opts,
                      ts_silence_mask=mask)
        monkeypatch.setenv('STABLE_TS_TPU_EPI', 'interpret')
        fused = decode(params, dims, tokenizer, mel, opts,
                       ts_silence_mask=mask)

        for rb, rf in zip(base, fused):
            assert rb.tokens == rf.tokens, (rb.tokens, rf.tokens)
            assert abs(rb.avg_logprob - rf.avg_logprob) < 1e-3
