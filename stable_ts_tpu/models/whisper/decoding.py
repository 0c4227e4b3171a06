"""Batched Whisper decoding on TPU.

Counterpart of whisper's DecodingTask plus the reference's additions
(/root/reference/stable_whisper/decode.py): cached audio features across
temperature retries and per-step timestamp-token suppression from a silence
mask (decode.py:14,54).

TPU-first design: the whole sampling loop is ONE jitted ``lax.while_loop``
over a fixed-size token buffer + KV cache — static shapes, early exit when
every batch row has emitted EOT. All logit filters (suppress lists, blank
suppression, Whisper's timestamp grammar, the silence timestamp mask) are
vectorized over the batch inside the loop; the sequence-dependent parts of
the timestamp grammar are tracked incrementally as (last, penultimate,
max-timestamp) state vectors instead of re-scanning the sequence, which is
equivalent because sampled timestamps are non-decreasing by construction.
Greedy and temperature sampling (+ best_of candidate selection) run in the
same loop; beam search runs in its own fixed-shape while_loop (``_beam_loop``)
with the beam axis batched, selected via ``beam_size``.
"""
import zlib
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .model import (ModelDimensions, decoder_prefill, decoder_step, encoder_apply,
                    precompute_cross_kv, precompute_cross_kv_t)
from .tokenizer import WhisperTokenizer


def _use_cross_kernel() -> bool:
    """Route decode cross-attention through the fused Pallas kernel
    (ops/cross_attn.py) — default on TPU, opt-out STABLE_TS_TPU_CROSS=0,
    'interpret' exercises it on CPU."""
    import os
    pref = os.environ.get('STABLE_TS_TPU_CROSS', 'auto')
    if pref in ('0', 'off', 'false'):
        return False
    if pref in ('1', 'on', 'true', 'interpret'):
        return True
    from .model import fused_kernels_enabled
    return fused_kernels_enabled() and jax.default_backend() == 'tpu'


def _use_int8_self_cache() -> bool:
    """Row-major int8 self-KV cache (STABLE_TS_TPU_SELFKV). The rows
    dequantize in registers inside the fused self-attention kernel
    (ops/self_attn.py), halving the per-step cache stream. (The round-2
    TRANSPOSED int8 cache lost to bf16 on strided column writes and was
    removed; this layout keeps the contiguous row write.)"""
    import os
    pref = os.environ.get('STABLE_TS_TPU_SELFKV', 'auto')
    if pref in ('1', 'on', 'true'):
        return True
    if pref in ('0', 'off', 'false'):
        return False
    # auto: only with the fused kernel path (the XLA fallback would
    # materialize dequantized slabs and lose the bandwidth it saves)
    from .model import _self_fa_mode
    return _self_fa_mode() == 'on'


_NEG = jnp.float32(-1e9)


def _ctx_buckets(sample_begin: int, sample_len: int, cache_ctx: int):
    """Cache-length buckets for the sampling loops.

    The per-step self-attention streams the whole fixed-size KV cache from
    HBM; most steps only need a prefix of it (pos grows by 1 per step).
    Splitting the sampling while_loop into consecutive loops — one per
    128-slot bucket, each compiled with a static ``ctx_live`` — lets the
    fused kernel's BlockSpec cover only the live prefix: a 256-slot cache
    reads 128 slots for the first ~128 positions (~half the self-KV
    stream, and wider row blocks per grid step). Returns
    [(ctx_live, i_bound), ...] where i_bound is the EXCLUSIVE step-index
    bound for that bucket (pos = sample_begin + i stays < ctx_live).
    """
    max_pos = sample_begin + sample_len  # one past the last written pos
    buckets = []
    c = (sample_begin + 128) // 128 * 128  # smallest multiple of 128 > begin
    while c < min(cache_ctx, max_pos):
        buckets.append((c, c - sample_begin))
        c += 128
    buckets.append((cache_ctx, sample_len))
    # decoder_step's contract: ctx_live >= pos + 1 for every step it runs,
    # else self-attention silently slices out live cache positions
    # (including the just-written token). Trace-time check: the bucket's
    # last step has pos = sample_begin + i_bound - 1.
    assert all(ctx >= min(sample_begin + bound, cache_ctx)
               for ctx, bound in buckets), \
        f'ctx bucket violates ctx_live >= pos + 1: {buckets} ' \
        f'(sample_begin={sample_begin}, cache_ctx={cache_ctx})'
    return buckets


@dataclass
class DecodingOptions:
    task: str = 'transcribe'
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None
    suppress_tokens: Optional[Union[str, Sequence[int]]] = '-1'
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    kv_quant: Optional[Union[bool, int]] = None
                                             # quantized cross-KV (the
                                             # dominant per-step HBM stream):
                                             # True/8 = int8 (halves it),
                                             # 4 = packed int4 (quarters it;
                                             # opt-in, coarser grid — never
                                             # the auto default), False = off.
                                             # None = auto: int8 for medium+
                                             # models (n_audio_state >= 1024)
                                             # where it is strictly faster,
                                             # off for small ones


@dataclass
class DecodingResult:
    audio_features: Optional[jnp.ndarray]
    language: str
    language_probs: Optional[dict] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ''
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


def compression_ratio(text: str) -> float:
    text_bytes = text.encode('utf-8')
    if not text_bytes:
        return 0.0
    return len(text_bytes) / len(zlib.compress(text_bytes))


# -- token preparation (host side, cheap) ------------------------------------------------


def build_suppress_list(tokenizer: WhisperTokenizer,
                        options: DecodingOptions) -> List[int]:
    suppress = options.suppress_tokens
    if isinstance(suppress, str):
        suppress = [int(t) for t in suppress.split(',')] if suppress else []
    else:
        suppress = list(suppress) if suppress is not None else []
    if -1 in suppress:
        suppress = [t for t in suppress if t >= 0]
        suppress.extend(tokenizer.non_speech_tokens)
    suppress.extend([tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
                     tokenizer.sot_prev, tokenizer.sot_lm])
    if tokenizer.no_speech is not None:
        suppress.append(tokenizer.no_speech)
    return sorted(set(suppress))


def build_initial_tokens(tokenizer: WhisperTokenizer, options: DecodingOptions,
                         n_text_ctx: int) -> Tuple[List[int], int, int]:
    """Return (initial_tokens, sot_index, sample_begin)."""
    tokens = list(tokenizer.sot_sequence)
    if options.without_timestamps:
        tokens.append(tokenizer.no_timestamps)
    if options.prefix is not None:
        prefix = (tokenizer.encode(' ' + options.prefix.strip())
                  if isinstance(options.prefix, str) else list(options.prefix))
        if options.sample_len is not None:
            prefix = prefix[-(n_text_ctx // 2 - options.sample_len):]
        tokens = tokens + prefix
    sot_index = 0
    if options.prompt is not None:
        prompt = (tokenizer.encode(' ' + options.prompt.strip())
                  if isinstance(options.prompt, str) else list(options.prompt))
        prompt_tokens = [tokenizer.sot_prev] + prompt[-(n_text_ctx // 2 - 1):]
        tokens = prompt_tokens + tokens
        sot_index = len(prompt_tokens)
    sot_index = tokens.index(tokenizer.sot)
    sample_begin = len(tokens)
    return tokens, sot_index, sample_begin


# -- the jitted sampling loop ----------------------------------------------------------


def _fused_greedy_loop(params, cross_kv, kv_cache, init_logits, tokens_init,
                       suppress_mask, ts_silence_mask, apply_filters, *,
                       n_head: int, sample_begin: int, sample_len: int,
                       eot: int, ts_begin: int, without_timestamps: bool,
                       q_per_kv: int, interpret: bool):
    """Greedy sampling with the fused vocab+filter epilogue: the while
    state carries six per-row aggregates (max/argmax/sumexp over the text
    and timestamp vocab halves) instead of full (B, V) logits. Traced
    inside :func:`_sample_loop`'s jit (not jitted itself)."""
    from ...ops.logit_epilogue import (fused_logit_aggregates,
                                       logit_aggregates_xla,
                                       prepare_epilogue_operands,
                                       select_from_aggregates)
    batch = init_logits.shape[0]
    with_grammar = not without_timestamps
    # loop-invariant operand prep (embedding pad etc.) stays OUTSIDE the
    # while bodies
    prepared = prepare_epilogue_operands(
        params['token_emb'], suppress_mask, ts_silence_mask,
        ts_begin=ts_begin)

    # the i == 0 selection reuses the full unfused filter stack on the
    # prefill logits (blank suppression, forced-first-timestamp,
    # max_initial_timestamp) — once per window, outside the loop
    neg1 = jnp.full((batch,), -1, jnp.int32)
    agg0 = logit_aggregates_xla(
        apply_filters(init_logits, jnp.int32(0), neg1, neg1, neg1), ts_begin)

    def make_cond(i_bound: int):
        def cond(state):
            i, _, _, _, _, finished, _, _, _ = state
            return (i < i_bound) & ~jnp.all(finished)
        return cond

    def make_body(ctx_live: int):
        def body(state):
            (i, tokens, agg, kv, sum_logprobs, finished, last_tok,
             penult_tok, max_ts) = state
            next_tok, tok_logprob = select_from_aggregates(
                agg, with_grammar=with_grammar)
            sum_logprobs = sum_logprobs + jnp.where(finished, 0.0,
                                                    tok_logprob)
            next_tok = jnp.where(finished, eot, next_tok)
            pos = sample_begin + i
            tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None],
                                                  (0, pos))
            new_finished = finished | (next_tok == eot)
            new_max_ts = jnp.where(
                ~finished & (next_tok >= ts_begin),
                jnp.maximum(max_ts, next_tok - ts_begin), max_ts)
            # grammar flags for the NEXT selection (step i + 1); mirrors
            # apply_filters with (i+1, last=next_tok, penult=last_tok)
            last_was_ts = next_tok >= ts_begin
            penult_was_ts = ((i + 1) < 2) | (last_tok >= ts_begin)
            text_ban = last_was_ts & ~penult_was_ts
            ts_ban = last_was_ts & penult_was_ts
            has_ts = new_max_ts >= 0
            ts_floor = jnp.where(text_ban, new_max_ts, new_max_ts + 1)
            flags = jnp.stack([
                text_ban.astype(jnp.float32), ts_ban.astype(jnp.float32),
                has_ts.astype(jnp.float32), ts_floor.astype(jnp.float32)])
            x_h, kv = decoder_step(params, next_tok[:, None], pos,
                                   cross_kv, kv, n_head, q_per_kv=q_per_kv,
                                   ctx_live=ctx_live, return_hidden=True)
            agg = fused_logit_aggregates(
                x_h, prepared, flags, ts_begin=ts_begin, eot=eot,
                with_grammar=with_grammar, interpret=interpret)
            return (i + 1, tokens, agg, kv, sum_logprobs, new_finished,
                    next_tok, last_tok, new_max_ts)
        return body

    state = (
        jnp.int32(0), tokens_init, agg0, kv_cache,
        jnp.zeros((batch,), jnp.float32),
        jnp.zeros((batch,), bool),
        jnp.full((batch,), -1, jnp.int32),
        jnp.full((batch,), -1, jnp.int32),
        jnp.full((batch,), -1, jnp.int32),
    )
    cache_ctx = kv_cache['k'].shape[2]
    for ctx, i_bound in _ctx_buckets(sample_begin, sample_len, cache_ctx):
        state = jax.lax.while_loop(make_cond(i_bound), make_body(ctx), state)
    (n_sampled, tokens, _, _, sum_logprobs, *_rest) = state
    return tokens, sum_logprobs, n_sampled


@partial(jax.jit, static_argnames=(
    'n_head', 'sample_begin', 'sample_len', 'n_text_ctx', 'eot', 'ts_begin',
    'n_vocab', 'max_initial_ts_index', 'suppress_blank', 'without_timestamps',
    'greedy', 'q_per_kv', 'fused_epilogue'))
def _sample_loop(params, cross_kv, kv_cache, init_logits, tokens_init, rng,
                 suppress_mask, blank_mask, ts_silence_mask,
                 n_head: int, sample_begin: int, sample_len: int,
                 n_text_ctx: int, eot: int, ts_begin: int, n_vocab: int,
                 max_initial_ts_index: int, suppress_blank: bool,
                 without_timestamps: bool, greedy: bool,
                 temperature=1.0, q_per_kv: int = 1,
                 fused_epilogue: str = 'off'):
    """Run the sampling loop.

    init_logits: (B, V) logits at the last prefill position.
    tokens_init: (B, n_text_ctx) buffer containing the initial tokens.
    suppress_mask: (V,) additive mask (0 or -1e9) applied at every step.
    blank_mask: (V,) additive mask applied only at the first sampled step.
    ts_silence_mask: (B, V) additive mask for silence-suppressed timestamp
        tokens (zeros when unused).
    Returns (tokens (B, n_text_ctx), sum_logprobs (B,), n_sampled).
    """
    batch = init_logits.shape[0]
    vocab_ids = jnp.arange(n_vocab)
    is_ts = vocab_ids >= ts_begin
    is_text = vocab_ids < ts_begin

    def apply_filters(logits, i, last_tok, penult_tok, max_ts):
        logits = logits + suppress_mask + ts_silence_mask
        if suppress_blank:
            logits = jnp.where(i == 0, logits + blank_mask, logits)
        if without_timestamps:
            return logits
        # -- Whisper timestamp grammar, vectorized over the batch --
        last_was_ts = last_tok >= ts_begin
        penult_was_ts = (i < 2) | (penult_tok >= ts_begin)
        # After a lone timestamp: only another timestamp or EOT.
        text_ban = last_was_ts & ~penult_was_ts
        # After a timestamp pair: no timestamps until text appears.
        ts_ban = last_was_ts & penult_was_ts
        logits = jnp.where(ts_ban[:, None] & is_ts[None, :], _NEG, logits)
        logits = jnp.where(text_ban[:, None] & (vocab_ids < eot)[None, :], _NEG,
                           logits)
        # Timestamps must be non-decreasing (strictly increasing after pairs).
        has_ts = max_ts >= 0
        ts_floor = jnp.where(text_ban, max_ts, max_ts + 1)
        below_floor = vocab_ids[None, :] < (ts_begin + ts_floor)[:, None]
        logits = jnp.where((has_ts[:, None]) & below_floor & is_ts[None, :],
                           _NEG, logits)
        # First sampled token must be a timestamp within max_initial_timestamp.
        first = i == 0
        logits = jnp.where(first & is_text[None, :], _NEG, logits)
        if max_initial_ts_index >= 0:
            too_late = vocab_ids[None, :] > (ts_begin + max_initial_ts_index)
            logits = jnp.where(first & too_late, _NEG, logits)
        # If total timestamp probability beats any text token, force timestamp.
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_logprob = jax.nn.logsumexp(
            jnp.where(is_ts[None, :], logprobs, _NEG), axis=-1)
        max_text_logprob = jnp.max(
            jnp.where(is_text[None, :], logprobs, _NEG), axis=-1)
        force_ts = ts_logprob > max_text_logprob
        logits = jnp.where(force_ts[:, None] & is_text[None, :], _NEG, logits)
        return logits

    def make_cond(i_bound: int):
        def cond(state):
            i, _, _, _, _, finished, _, _, _, _ = state
            return (i < i_bound) & ~jnp.all(finished)
        return cond

    if greedy and fused_epilogue != 'off':
        # Fused epilogue (ops/logit_epilogue.py): the loop state carries
        # (B, 6) part-wise aggregates instead of (B, V) logits — the vocab
        # projection, filter chain, log_softmax and argmax all collapse
        # into the kernel's tile walk. Selection semantics (incl. the
        # force-timestamp rule) are reproduced exactly from the
        # aggregates; tests/test_logit_epilogue.py pins loop equivalence.
        return _fused_greedy_loop(
            params, cross_kv, kv_cache, init_logits, tokens_init,
            suppress_mask, ts_silence_mask, apply_filters,
            n_head=n_head, sample_begin=sample_begin,
            sample_len=sample_len, eot=eot, ts_begin=ts_begin,
            without_timestamps=without_timestamps, q_per_kv=q_per_kv,
            interpret=fused_epilogue == 'interpret')

    def make_body(ctx_live: int):
        def body(state):
            (i, tokens, logits, kv, sum_logprobs, finished, last_tok,
             penult_tok, max_ts, key) = state
            filtered = apply_filters(logits, i, last_tok, penult_tok, max_ts)
            logprobs = jax.nn.log_softmax(filtered, axis=-1)
            if greedy:
                next_tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
            else:
                # traced temperature: every rung of the fallback ladder shares
                # ONE compiled sampler instead of compiling per temperature
                key, sub = jax.random.split(key)
                next_tok = jax.random.categorical(
                    sub, filtered / temperature, axis=-1).astype(jnp.int32)
            tok_logprob = jnp.take_along_axis(
                logprobs, next_tok[:, None], axis=-1)[:, 0]
            sum_logprobs = sum_logprobs + jnp.where(finished, 0.0, tok_logprob)
            next_tok = jnp.where(finished, eot, next_tok)
            pos = sample_begin + i
            tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None],
                                                  (0, pos))
            new_finished = finished | (next_tok == eot)
            new_max_ts = jnp.where(
                ~finished & (next_tok >= ts_begin),
                jnp.maximum(max_ts, next_tok - ts_begin), max_ts)
            new_logits, kv = decoder_step(params, next_tok[:, None], pos,
                                          cross_kv, kv, n_head,
                                          q_per_kv=q_per_kv,
                                          ctx_live=ctx_live)
            return (i + 1, tokens, new_logits, kv, sum_logprobs, new_finished,
                    next_tok, last_tok, new_max_ts, key)
        return body

    state = (
        jnp.int32(0), tokens_init, init_logits, kv_cache,
        jnp.zeros((batch,), jnp.float32),
        jnp.zeros((batch,), bool),
        jnp.full((batch,), -1, jnp.int32),
        jnp.full((batch,), -1, jnp.int32),
        jnp.full((batch,), -1, jnp.int32),
        rng,
    )
    # Consecutive while_loops, one per 128-slot cache bucket: each is
    # compiled with a static ``ctx_live`` so the fused self-attention only
    # streams the live cache prefix (see _ctx_buckets). Early-exit carries
    # through — once every row is finished, later buckets' conds are false.
    cache_ctx = kv_cache['k'].shape[2]
    for ctx, i_bound in _ctx_buckets(sample_begin, sample_len, cache_ctx):
        state = jax.lax.while_loop(make_cond(i_bound), make_body(ctx), state)
    (n_sampled, tokens, _, _, sum_logprobs, *_rest) = state
    return tokens, sum_logprobs, n_sampled


@partial(jax.jit, static_argnames=(
    'n_head', 'sample_begin', 'sample_len', 'n_text_ctx', 'eot', 'ts_begin',
    'n_vocab', 'max_initial_ts_index', 'suppress_blank', 'without_timestamps',
    'beam_size', 'max_candidates'))
def _beam_loop(params, cross_kv, kv_cache, init_logits, tokens_init,
               suppress_mask, blank_mask, ts_silence_mask,
               n_head: int, sample_begin: int, sample_len: int,
               n_text_ctx: int, eot: int, ts_begin: int, n_vocab: int,
               max_initial_ts_index: int, suppress_blank: bool,
               without_timestamps: bool, beam_size: int, max_candidates: int):
    # cross_kv carries ONE row per window group (not per beam): the beams'
    # reshuffle never touches it, and the fused kernel / shared-KV einsum
    # streams each window's K/V once per step for all its beams.
    """Beam search over ``n_groups`` windows with ``beam_size`` beams each.

    All rows (= n_groups * beam_size) advance in lockstep. The self-KV
    cache is NEVER gathered on reshuffle: each row's K/V rows stay where
    they were written, and a (rows, n_ctx) int32 ancestry table — which
    group row wrote the K/V this beam should attend at each position — is
    gathered instead (~KBs vs the GBs of cache; the fused kernel selects
    by ancestor in VMEM, ops/self_attn.py). Finished (EOT-ended)
    hypotheses accumulate in a fixed-size per-group pool of
    ``max_candidates`` (= ceil(beam_size * patience)); a group stops
    contributing once its pool is full, and the loop exits when every pool
    is full or ``sample_len`` is exhausted.

    Returns (tokens (rows, ctx), cum_logprobs (rows,),
             finished_tokens (groups, max_candidates, ctx),
             finished_scores (groups, max_candidates) — -inf where empty).
    """
    rows = init_logits.shape[0]
    n_groups = rows // beam_size
    vocab_ids = jnp.arange(n_vocab)
    is_ts = vocab_ids >= ts_begin
    is_text = vocab_ids < ts_begin
    NEG = jnp.float32(-1e30)

    def apply_filters(logits, i, last_tok, penult_tok, max_ts):
        logits = logits + suppress_mask + ts_silence_mask
        if suppress_blank:
            logits = jnp.where(i == 0, logits + blank_mask, logits)
        if without_timestamps:
            return logits
        last_was_ts = last_tok >= ts_begin
        penult_was_ts = (i < 2) | (penult_tok >= ts_begin)
        text_ban = last_was_ts & ~penult_was_ts
        ts_ban = last_was_ts & penult_was_ts
        logits = jnp.where(ts_ban[:, None] & is_ts[None, :], _NEG, logits)
        logits = jnp.where(text_ban[:, None] & (vocab_ids < eot)[None, :], _NEG,
                           logits)
        has_ts = max_ts >= 0
        ts_floor = jnp.where(text_ban, max_ts, max_ts + 1)
        below = vocab_ids[None, :] < (ts_begin + ts_floor)[:, None]
        logits = jnp.where(has_ts[:, None] & below & is_ts[None, :], _NEG, logits)
        first = i == 0
        logits = jnp.where(first & is_text[None, :], _NEG, logits)
        if max_initial_ts_index >= 0:
            too_late = vocab_ids[None, :] > (ts_begin + max_initial_ts_index)
            logits = jnp.where(first & too_late, _NEG, logits)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_lp = jax.nn.logsumexp(jnp.where(is_ts[None, :], logprobs, _NEG), -1)
        max_text_lp = jnp.max(jnp.where(is_text[None, :], logprobs, _NEG), -1)
        logits = jnp.where((ts_lp > max_text_lp)[:, None] & is_text[None, :],
                           _NEG, logits)
        return logits

    def make_cond(i_bound: int):
        def cond(state):
            i = state[0]
            fin_scores = state[11]
            pool_full = jnp.all(fin_scores > NEG / 2, axis=1)  # (groups, cand)
            return (i < i_bound) & ~jnp.all(pool_full)
        return cond

    local_idx = (jnp.arange(rows, dtype=jnp.int32) % beam_size)

    def make_body(ctx_live: int):
      def body(state):
        (i, tokens, logits, kv, anc, cum_lp, last_tok, penult_tok, max_ts,
         group_done, fin_tokens, fin_scores) = state
        filtered = apply_filters(logits, i, last_tok, penult_tok, max_ts)
        logprobs = jax.nn.log_softmax(filtered, axis=-1)  # (rows, V)
        k = 2 * beam_size
        # Two-stage top-k: per-row over the vocab, then a merge over the
        # group's beam_size*k survivors. The single-stage top-k over the
        # flattened (groups, beam*V) matrix sorted 260k columns per group
        # per step; the group merge can keep at most k entries from any
        # one row, so stage 1's k per row loses nothing. cum_lp is
        # constant per row — adding it after stage 1 preserves order.
        row_scores, row_tok = jax.lax.top_k(logprobs, k)  # (rows, k)
        grp_scores = (cum_lp[:, None] + row_scores).reshape(n_groups,
                                                            beam_size * k)
        grp_tok = row_tok.reshape(n_groups, beam_size * k)
        # Rows of finished groups contribute nothing new.
        grp_scores = jnp.where(group_done[:, None], NEG, grp_scores)
        top_scores, sel = jax.lax.top_k(grp_scores, k)  # (groups, k)
        src_beam = sel // k                             # within-group beam id
        tok = jnp.take_along_axis(grp_tok, sel, axis=1).astype(jnp.int32)
        is_eot = tok == eot

        # Push EOT candidates into the finished pool (keep best max_candidates).
        eot_scores = jnp.where(is_eot, top_scores, NEG)  # (groups, k)
        src_rows = (src_beam
                    + jnp.arange(n_groups)[:, None] * beam_size)  # (groups, k)
        cand_tokens = tokens[src_rows]  # (groups, k, ctx)
        cand_tokens = cand_tokens.at[:, :, sample_begin + i].set(eot)
        all_scores = jnp.concatenate([fin_scores, eot_scores], axis=1)
        all_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        order = jnp.argsort(-all_scores, axis=1)[:, :max_candidates]
        fin_scores = jnp.take_along_axis(all_scores, order, axis=1)
        fin_tokens = jnp.take_along_axis(all_tokens, order[:, :, None], axis=1)

        # Select the next active beams from non-EOT candidates.
        live_scores = jnp.where(is_eot, NEG, top_scores)
        live_order = jnp.argsort(-live_scores, axis=1)[:, :beam_size]
        new_cum = jnp.take_along_axis(live_scores, live_order, axis=1)
        new_tok = jnp.take_along_axis(tok, live_order, axis=1)
        new_src_rows = jnp.take_along_axis(src_rows, live_order, axis=1)
        # Finished groups keep their state frozen (scores unchanged).
        keep_rows = (jnp.arange(beam_size)[None, :]
                     + jnp.arange(n_groups)[:, None] * beam_size)
        new_group_done = jnp.all(fin_scores > NEG / 2, axis=1)
        new_src_rows = jnp.where(group_done[:, None], keep_rows, new_src_rows)
        new_cum = jnp.where(group_done[:, None],
                            cum_lp.reshape(n_groups, beam_size), new_cum)
        flat_src = new_src_rows.reshape(-1)
        new_tok_flat = jnp.where(group_done[:, None], eot, new_tok).reshape(-1)

        # Reorder sequence state to the chosen source beams. The KV cache
        # itself stays put — only the ancestry table reshuffles.
        tokens = tokens[flat_src]
        pos = sample_begin + i
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok_flat[:, None].astype(jnp.int32), (0, pos))
        anc = anc[flat_src]
        # The step below writes the new token's K/V into each row's OWN
        # cache slot at ``pos``.
        anc = jax.lax.dynamic_update_slice(anc, local_idx[:, None], (0, pos))
        new_last = new_tok_flat.astype(jnp.int32)
        new_penult = last_tok[flat_src]
        new_max_ts = jnp.where(
            new_last >= ts_begin,
            jnp.maximum(max_ts[flat_src], new_last - ts_begin),
            max_ts[flat_src])

        new_logits, kv = decoder_step(params, new_last[:, None], pos, cross_kv,
                                      kv, n_head, q_per_kv=beam_size, anc=anc,
                                      ctx_live=ctx_live)
        return (i + 1, tokens, new_logits, kv, anc, new_cum.reshape(-1),
                new_last, new_penult, new_max_ts, new_group_done, fin_tokens,
                fin_scores)
      return body

    # Only beam 0 of each group starts live so step 0 diversifies the beams.
    init_cum = jnp.where(jnp.arange(rows) % beam_size == 0, 0.0, NEG)
    # Prefill wrote every row's own prefix in place -> ancestor = self.
    cache_ctx = kv_cache['k'].shape[2]
    init_anc = jnp.broadcast_to(local_idx[:, None], (rows, cache_ctx))
    state = (
        jnp.int32(0), tokens_init, init_logits, kv_cache, init_anc, init_cum,
        jnp.full((rows,), -1, jnp.int32),
        jnp.full((rows,), -1, jnp.int32),
        jnp.full((rows,), -1, jnp.int32),
        jnp.zeros((n_groups,), bool),
        jnp.zeros((n_groups, max_candidates, n_text_ctx), jnp.int32),
        jnp.full((n_groups, max_candidates), NEG),
    )
    # Bucketed cache stream, same chaining as _sample_loop: each bucket's
    # while_loop attends only the live cache prefix.
    for ctx, i_bound in _ctx_buckets(sample_begin, sample_len, cache_ctx):
        state = jax.lax.while_loop(make_cond(i_bound), make_body(ctx), state)
    (_, tokens, _, _, _, cum_lp, *_rest, fin_tokens, fin_scores) = state
    return tokens, cum_lp, fin_tokens, fin_scores


# -- public API -----------------------------------------------------------------------------


def detect_language(params, dims: ModelDimensions, tokenizer: WhisperTokenizer,
                    mel_or_features: jnp.ndarray):
    """Return (language_codes, probs_per_row) for a batch of windows."""
    xa = _audio_features(params, dims, mel_or_features)
    tokens = jnp.full((xa.shape[0], 1), tokenizer.sot, jnp.int32)
    from .model import decoder_apply
    logits, _ = decoder_apply(params['decoder'], tokens, xa, dims.n_text_head)
    logits = np.asarray(logits[:, 0])  # (B, V)
    mask = np.full(logits.shape[-1], -np.inf)
    lang_tokens = np.asarray(tokenizer.all_language_tokens)
    mask[lang_tokens] = 0.0
    logits = logits + mask
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    langs, prob_maps = [], []
    for row in probs:
        best = lang_tokens[row[lang_tokens].argmax()]
        code = tokenizer.all_language_codes[list(lang_tokens).index(best)]
        langs.append(code)
        prob_maps.append({c: float(row[t]) for c, t in
                          zip(tokenizer.all_language_codes, lang_tokens)})
    return langs, prob_maps


def _audio_features(params, dims: ModelDimensions, mel_or_features):
    x = jnp.asarray(mel_or_features)
    if x.ndim == 2:
        x = x[None]
    if x.shape[-2] == dims.n_mels:  # it's a mel, encode it
        return encoder_apply(params['encoder'], x, dims.n_audio_head)
    return x


def _finalize_beam(tokens_act, cum_lp, fin_tokens, fin_scores, batch,
                   options, tokenizer, xa, no_speech_probs,
                   sample_begin: int, sample_len: int) -> List['DecodingResult']:
    """Pick the best finished hypothesis per group (fallback: best live beam)."""
    NEG_HALF = -5e29
    beam = options.beam_size
    results = []
    language = tokenizer.language or 'en'
    for b in range(batch):
        candidates = []  # (score_sum, token_list)
        for c in range(fin_scores.shape[1]):
            if fin_scores[b, c] > NEG_HALF:
                seq = fin_tokens[b, c, sample_begin:sample_begin + sample_len]
                eot_pos = np.flatnonzero(seq == tokenizer.eot)
                seq = seq[:eot_pos[0]] if len(eot_pos) else seq
                candidates.append((float(fin_scores[b, c]), seq))
        if not candidates:
            for r in range(b * beam, (b + 1) * beam):
                if cum_lp[r] > NEG_HALF:
                    seq = tokens_act[r, sample_begin:sample_begin + sample_len]
                    eot_pos = np.flatnonzero(seq == tokenizer.eot)
                    seq = seq[:eot_pos[0]] if len(eot_pos) else seq
                    candidates.append((float(cum_lp[r]), seq))
        best_score, best_seq = -np.inf, np.zeros(0, np.int64)
        for score_sum, seq in candidates:
            n = len(seq) + 1
            if options.length_penalty is None:
                score = score_sum / n
            else:
                score = score_sum / (((5 + n) / 6) ** options.length_penalty)
            if score > best_score:
                best_score, best_seq = score, seq
        text_tokens = [int(t) for t in best_seq]
        text = tokenizer.decode([t for t in text_tokens
                                 if t < tokenizer.eot]).strip()
        # avg_logprob from the raw cumulative score of the chosen hypothesis.
        chosen_sum = next((s for s, seq in candidates
                           if len(seq) == len(best_seq)
                           and np.array_equal(seq, best_seq)), -np.inf)
        results.append(DecodingResult(
            audio_features=xa[b] if xa is not None else None,
            language=language,
            tokens=text_tokens,
            text=text,
            avg_logprob=float(chosen_sum / (len(best_seq) + 1)),
            no_speech_prob=float(no_speech_probs[b * beam]),
            temperature=options.temperature,
            compression_ratio=compression_ratio(text),
        ))
    return results


@dataclass
class PendingDecode:
    """A dispatched (not yet materialized) batched decode.

    ``decode_launch`` returns immediately after queueing the device work —
    JAX dispatch is asynchronous — so callers can overlap host work (or
    launch the next batch) with the sampling loop. ``decode_collect`` blocks
    on the outputs and builds the DecodingResults. This two-phase seam is
    the reference's cached-``audio_features`` trick (decode.py:27-30) taken
    one step further: features live in ``xa`` for fallback reuse AND the
    host never synchronizes mid-decode.
    """
    kind: str                      # 'sample' | 'beam'
    xa: jnp.ndarray                # (B, 1500, d) encoder features
    batch: int
    n_group: int
    options: DecodingOptions
    tokenizer: WhisperTokenizer
    sample_begin: int
    sample_len: int
    no_speech_probs: jnp.ndarray   # (rows,) device array
    outputs: tuple                 # loop outputs, still on device


def decode(params, dims: ModelDimensions, tokenizer: WhisperTokenizer,
           mel_or_features, options: DecodingOptions = DecodingOptions(),
           ts_silence_mask: Optional[np.ndarray] = None,
           rng: Optional[jax.Array] = None,
           with_features: bool = True) -> List[DecodingResult]:
    """Decode a batch of 30-s windows. Returns one DecodingResult per row.

    ``ts_silence_mask``: optional bool (B, 1501) — True marks timestamp
    tokens to suppress (the reference's silence-mask rule, decode.py:54).
    """
    return decode_collect(decode_launch(
        params, dims, tokenizer, mel_or_features, options,
        ts_silence_mask=ts_silence_mask, rng=rng),
        with_features=with_features)


def decode_launch(params, dims: ModelDimensions, tokenizer: WhisperTokenizer,
                  mel_or_features,
                  options: DecodingOptions = DecodingOptions(),
                  ts_silence_mask: Optional[np.ndarray] = None,
                  rng: Optional[jax.Array] = None) -> PendingDecode:
    """Dispatch a batched decode; see :class:`PendingDecode`.

    ``mel_or_features`` may be precomputed encoder features — callers doing
    temperature fallback should encode once and pass features on every rung
    (the reference reuses ``audio_features`` the same way,
    decode.py:27-30, original_whisper.py:534).
    """
    xa = _audio_features(params, dims, mel_or_features)
    batch = xa.shape[0]

    use_beam = options.beam_size is not None and options.temperature == 0
    if use_beam:
        n_group = options.beam_size
    else:
        n_group = options.best_of if (options.best_of and options.temperature > 0) else 1
    if n_group > 1:
        xa_rep = jnp.repeat(xa, n_group, axis=0)
    else:
        xa_rep = xa

    initial_tokens, sot_index, sample_begin = build_initial_tokens(
        tokenizer, options, dims.n_text_ctx)
    sample_len = options.sample_len or (dims.n_text_ctx // 2)
    sample_len = min(sample_len, dims.n_text_ctx - sample_begin - 1)

    suppress = np.zeros(dims.n_vocab, np.float32)
    suppress[build_suppress_list(tokenizer, options)] = -1e9
    suppress[tokenizer.no_timestamps] = -1e9
    blank = np.zeros(dims.n_vocab, np.float32)
    blank[tokenizer.encode(' ') + [tokenizer.eot]] = -1e9

    full_batch = batch * n_group
    ts_mask_arr = np.zeros((full_batch, dims.n_vocab), np.float32)
    if ts_silence_mask is not None:
        sm = np.asarray(ts_silence_mask, bool)
        if sm.ndim == 1:
            sm = sm[None].repeat(batch, 0)
        sm = np.repeat(sm, n_group, axis=0)
        width = min(sm.shape[-1], dims.n_vocab - tokenizer.timestamp_begin)
        ts_mask_arr[:, tokenizer.timestamp_begin:tokenizer.timestamp_begin + width] = \
            np.where(sm[:, :width], -1e9, 0.0)

    if options.max_initial_timestamp and not options.without_timestamps:
        max_initial_ts_index = round(options.max_initial_timestamp / 0.02)
    else:
        max_initial_ts_index = -1

    # Prefill: forward the initial tokens once, filling the KV cache.
    # The cache is bucketed to the largest position the sampler can write
    # (sample_begin + sample_len, rounded up to 128 — the fused
    # self-attention kernel's scale vectors ride the lane dimension)
    # instead of the full n_text_ctx — the per-step self-attention streams
    # the whole cache from HBM, so a 256-slot cache reads ~43% less than a
    # 448-slot one.
    int8_self = _use_int8_self_cache()
    quantum = 128
    cache_len = min(dims.n_text_ctx,
                    ((sample_begin + int(sample_len) + quantum) // quantum)
                    * quantum)
    tokens0 = jnp.asarray(initial_tokens, jnp.int32)[None].repeat(full_batch, 0)
    prefill_logits, kv_cache = decoder_prefill(
        params['decoder'], tokens0, xa_rep, dims.n_text_head, cache_len,
        int8_cache=int8_self)
    # Fused self-attention projection for the sampler: one (d, 3d) matmul
    # per layer per token instead of three (d, d) launches. Built per call
    # (cheap concat), injected as an extra scanned leaf (model.py:
    # fuse_self_qkv) — checkpoint layout unchanged, math bit-identical
    # (column-independent accumulation).
    from .model import fuse_self_qkv
    dec_params = dict(params['decoder'])
    dec_params['blocks'] = fuse_self_qkv(dec_params['blocks'])
    kv_quant = (dims.n_audio_state >= 1024 if options.kv_quant is None
                else options.kv_quant)
    # Cross-KV is computed (and stored) per WINDOW, never per beam/candidate:
    # every row group of n_group beams shares its window's K/V via
    # q_per_kv, which divides the dominant per-step HBM stream AND the
    # cross-KV HBM footprint by n_group.
    if _use_cross_kernel():
        cross_kv = precompute_cross_kv_t(params['decoder'], xa,
                                         quantize=kv_quant)
    else:
        cross_kv = precompute_cross_kv(params['decoder'], xa,
                                       quantize=kv_quant)

    # no_speech prob stays a device array: materializing it here would be a
    # host sync in the middle of the dispatch stream.
    sot_logits = prefill_logits[:, sot_index]
    no_speech_probs = jax.nn.softmax(sot_logits, axis=-1)[:, tokenizer.no_speech]

    tokens_buf = jnp.zeros((full_batch, dims.n_text_ctx), jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, tokens0, (0, 0))

    if rng is None:
        rng = jax.random.PRNGKey(0)

    if use_beam:
        import math
        max_candidates = int(math.ceil(options.beam_size
                                       * (options.patience or 1.0)))
        tokens_act, cum_lp, fin_tokens, fin_scores = _beam_loop(
            dec_params, cross_kv, kv_cache, prefill_logits[:, -1],
            tokens_buf,
            jnp.asarray(suppress), jnp.asarray(blank), jnp.asarray(ts_mask_arr),
            n_head=dims.n_text_head, sample_begin=sample_begin,
            sample_len=int(sample_len), n_text_ctx=dims.n_text_ctx,
            eot=tokenizer.eot, ts_begin=tokenizer.timestamp_begin,
            n_vocab=dims.n_vocab,
            max_initial_ts_index=max_initial_ts_index,
            suppress_blank=options.suppress_blank,
            without_timestamps=options.without_timestamps,
            beam_size=int(options.beam_size), max_candidates=max_candidates)
        return PendingDecode(
            kind='beam', xa=xa, batch=batch, n_group=n_group, options=options,
            tokenizer=tokenizer, sample_begin=sample_begin,
            sample_len=int(sample_len), no_speech_probs=no_speech_probs,
            outputs=(tokens_act, cum_lp, fin_tokens, fin_scores))

    from ...ops.logit_epilogue import _epilogue_mode
    tokens_out, sum_logprobs, _ = _sample_loop(
        dec_params, cross_kv, kv_cache, prefill_logits[:, -1],
        tokens_buf, rng,
        jnp.asarray(suppress), jnp.asarray(blank), jnp.asarray(ts_mask_arr),
        n_head=dims.n_text_head, sample_begin=sample_begin,
        sample_len=int(sample_len), n_text_ctx=dims.n_text_ctx,
        eot=tokenizer.eot, ts_begin=tokenizer.timestamp_begin,
        n_vocab=dims.n_vocab,
        max_initial_ts_index=max_initial_ts_index,
        suppress_blank=options.suppress_blank,
        without_timestamps=options.without_timestamps,
        greedy=options.temperature == 0,
        temperature=jnp.float32(options.temperature or 1.0),
        q_per_kv=n_group,
        fused_epilogue=(_epilogue_mode()
                        if options.temperature == 0 else 'off'))

    return PendingDecode(
        kind='sample', xa=xa, batch=batch, n_group=n_group, options=options,
        tokenizer=tokenizer, sample_begin=sample_begin,
        sample_len=int(sample_len), no_speech_probs=no_speech_probs,
        outputs=(tokens_out, sum_logprobs))


def decode_collect(pending: PendingDecode,
                   with_features: bool = True) -> List[DecodingResult]:
    """Materialize a :class:`PendingDecode` into DecodingResults (blocks).

    ``with_features=False`` skips the per-row ``xa[b]`` feature slices —
    the batched driver keeps the group features itself and never reads
    ``DecodingResult.audio_features``, and the eager slice dispatches are
    measurable host overhead across the fallback ladder's rungs.
    """
    options, tokenizer = pending.options, pending.tokenizer
    batch, n_group = pending.batch, pending.n_group
    sample_begin, sample_len = pending.sample_begin, pending.sample_len
    xa = pending.xa if with_features else None
    no_speech_probs = np.asarray(pending.no_speech_probs)

    if pending.kind == 'beam':
        tokens_act, cum_lp, fin_tokens, fin_scores = pending.outputs
        return _finalize_beam(
            np.asarray(tokens_act), np.asarray(cum_lp),
            np.asarray(fin_tokens), np.asarray(fin_scores),
            batch, options, tokenizer, xa, no_speech_probs,
            sample_begin, sample_len)

    tokens_out, sum_logprobs = pending.outputs
    tokens_np = np.asarray(tokens_out)
    sum_logprobs = np.asarray(sum_logprobs)

    # Candidate selection (best_of) by length-normalized logprob.
    results = []
    language = tokenizer.language or 'en'
    for b in range(batch):
        rows = range(b * n_group, (b + 1) * n_group)
        best_row, best_score, best_tokens = None, -np.inf, None
        for r in rows:
            seq = tokens_np[r, sample_begin:sample_begin + sample_len]
            eot_pos = np.flatnonzero(seq == tokenizer.eot)
            seq = seq[:eot_pos[0]] if len(eot_pos) else seq
            n = len(seq) + 1
            if options.length_penalty is None:
                score = sum_logprobs[r] / n
            else:
                score = sum_logprobs[r] / (((5 + n) / 6) ** options.length_penalty)
            if score > best_score:
                best_row, best_score, best_tokens = r, score, seq
        text_tokens = [int(t) for t in best_tokens]
        text = tokenizer.decode([t for t in text_tokens if t < tokenizer.eot]).strip()
        avg_logprob = sum_logprobs[best_row] / (len(best_tokens) + 1)
        results.append(DecodingResult(
            audio_features=xa[b] if xa is not None else None,
            language=language,
            tokens=text_tokens,
            text=text,
            avg_logprob=float(avg_logprob),
            no_speech_prob=float(no_speech_probs[best_row]),
            temperature=options.temperature,
            compression_ratio=compression_ratio(text),
        ))
    return results
