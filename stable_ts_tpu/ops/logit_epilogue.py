"""Fused vocab-projection + logit-filter epilogue for the greedy decode step.

The sampling loop's per-step tail is ``logits = x @ emb.T`` (M tiny, V the
51 k vocab) followed by the Whisper timestamp-grammar filter chain and a
full-vocab log_softmax + argmax (reference semantics:
stable_whisper/decode.py:14-54 + whisper's ApplyTimestampRules). As
separate XLA ops that is ~10 elementwise passes over a (B, V) f32 tensor
plus the logits' HBM round-trip, measured 0.49 ms/step of loop small-ops +
0.68 ms of projection against a 0.06 + 0.16 ms stream floor (BASELINE.md
round-4 phase table).

This kernel REMOVES the (B, V) tensor from the loop instead of
rescheduling it (the round-4 rule: only structural removals win — the
plain streaming vocab kernel lost because it serialized against the
filter chain; here the chain no longer exists). It walks the embedding in
(block_v, d) row tiles exactly as stored, computes the tile's filtered
logits in VMEM, and folds them into six per-row aggregates:

  (max, argmax, sumexp) over the TEXT ids  [0, ts_begin)
  (max, argmax, sumexp) over the TS ids    [ts_begin, V)

which are sufficient statistics for everything the greedy loop consumed
the logits for:

  force-timestamp rule  lse_ts > max_text        (log_softmax cancels)
  next token            argmax of the winning part(s)
  token logprob         chosen - lse(live parts)

so the decode step's epilogue output shrinks from (B, 51 k) f32 to
(6, B) — the vocab tensor never touches HBM. Sumexp accumulates
online-softmax style (rescale by exp(m_old - m_new)); argmax merges keep
the FIRST maximum (strictly-greater replacement over ascending tiles),
matching ``jnp.argmax`` tie-breaking exactly.

Filter semantics per row r, vocab id t (mirrors decoding.apply_filters):
  base      logits + suppress[t] + ts_silence[r, t]
  ts_ban    last two sampled were a timestamp pair -> ban ts ids
  text_ban  lone timestamp -> ban ids < eot
  floor     timestamps non-decreasing: ban ts ids < ts_begin + floor[r]
(the i == 0 rules — blank suppression, forced-first-timestamp,
max_initial_timestamp — run once per window on the prefill logits
outside the loop, never here).
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_logit_aggregates', 'logit_aggregates_xla',
           'select_from_aggregates']

_NEG = -1e9     # filter ban value (matches decoding._NEG)
_MINF = -1e30   # accumulator identity (below any real logit)


def _kernel(x_ref, emb_ref, sup_ref, ts_sil_ref, flags_ref, out_ref, *,
            block_v: int, ts_begin: int, eot: int, n_vocab: int,
            tail_start: int, with_grammar: bool):
    j = pl.program_id(0)
    b = x_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        out_ref[0] = jnp.full((b, 128), _MINF)   # m_text
        out_ref[1] = jnp.zeros((b, 128))         # a_text
        out_ref[2] = jnp.zeros((b, 128))         # s_text
        out_ref[3] = jnp.full((b, 128), _MINF)   # m_ts
        out_ref[4] = jnp.zeros((b, 128))         # a_ts
        out_ref[5] = jnp.zeros((b, 128))         # s_ts

    # (B, d) x (block_v, d) -> f32 (B, block_v) on the MXU
    f = jax.lax.dot_general(x_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ids = (j * block_v
           + jax.lax.broadcasted_iota(jnp.int32, (b, block_v), 1))
    f = f + sup_ref[:]                     # suppress list (+ pad lanes -1e9)

    # timestamp-silence mask: nonzero only in the block-aligned tail
    # [tail_start, Vp); the whole tail is VMEM-resident (constant index
    # map), each covered tile adds its aligned slab (clamped slice +
    # where — tiles below the tail read slab 0 and add zeros)
    t0 = tail_start // block_v
    n_tail_tiles = (ts_sil_ref.shape[1] // block_v) - 1
    off = jnp.clip(j - t0, 0, n_tail_tiles) * block_v
    slab = ts_sil_ref[:, pl.ds(off, block_v)]
    f = f + jnp.where(j >= t0, slab, 0.0)

    is_ts = ids >= ts_begin
    if with_grammar:
        text_ban = flags_ref[0] > 0.0      # (B, 128) broadcast flags
        ts_ban = flags_ref[1] > 0.0
        has_ts = flags_ref[2] > 0.0
        floor = flags_ref[3]
        fid = ids.astype(jnp.float32)      # ids < 2^24: f32-exact
        real = ids < n_vocab               # never raise pad lanes to -1e9
        g = f[...]
        g = jnp.where(ts_ban[:, :1] & is_ts & real, _NEG, g)
        g = jnp.where(text_ban[:, :1] & (ids < eot), _NEG, g)
        g = jnp.where(has_ts[:, :1] & is_ts & real
                      & (fid < ts_begin + floor[:, :1]), _NEG, g)
        f = g

    def fold(part_mask, base):
        fm = jnp.where(part_mask, f, _MINF)
        tm = jnp.max(fm, axis=1, keepdims=True)                  # (B, 1)
        ta = jnp.min(jnp.where(fm == tm, ids, jnp.int32(2 ** 30)),
                     axis=1, keepdims=True).astype(jnp.float32)
        # exp(-1e30 - tm) flushes to 0 whenever the tile holds any real
        # value; an all-masked tile contributes garbage sumexp under an
        # m = -1e30 reference, which the merge then multiplies by
        # exp(-1e30 - m_new) = 0 as soon as any real tile lands
        ts_e = jnp.sum(jnp.exp(fm - tm), axis=1, keepdims=True)
        m_old = out_ref[base][:, :1]
        a_old = out_ref[base + 1][:, :1]
        s_old = out_ref[base + 2][:, :1]
        m_new = jnp.maximum(m_old, tm)
        s_new = (s_old * jnp.exp(m_old - m_new)
                 + ts_e * jnp.exp(tm - m_new))
        a_new = jnp.where(tm > m_old, ta, a_old)
        out_ref[base] = jnp.broadcast_to(m_new, (b, 128))
        out_ref[base + 1] = jnp.broadcast_to(a_new, (b, 128))
        out_ref[base + 2] = jnp.broadcast_to(s_new, (b, 128))

    fold(~is_ts, 0)
    fold(is_ts, 3)


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def prepare_epilogue_operands(emb: jnp.ndarray, suppress: jnp.ndarray,
                              ts_silence: jnp.ndarray, *, ts_begin: int,
                              block_v: int = 0):
    """Pad/lay out the loop-invariant kernel operands ONCE, outside the
    sampling while_loop (the embedding pad alone copies the 133 MB table —
    it must never sit inside the loop body).

    Returns (emb_pad (Vp, d), sup (1, Vp) with -1e9 pad lanes,
    ts_tail (B, Vp - tail_start)) plus the static (block_v, tail_start).
    """
    v, d = emb.shape
    if not block_v:
        block_v = 1024 if d <= 2048 else 512
    vp = _pad_to(v, block_v)
    emb_pad = jnp.pad(emb, ((0, vp - v), (0, 0))) if vp != v else emb
    # pad lanes excluded via the suppress vector (rides every tile anyway);
    # the pad value must sit BELOW the -1e9 ban value, else an all-banned
    # part would count pad lanes into its sumexp (banned lanes are real
    # values; pad lanes must behave like the mask identity)
    sup = jnp.full((1, vp), _MINF, jnp.float32).at[0, :v].set(
        suppress.astype(jnp.float32))
    tail_start = (ts_begin // block_v) * block_v
    bp = _pad_to(max(ts_silence.shape[0], 8), 8)
    ts_tail = jnp.pad(ts_silence.astype(jnp.float32)[:, tail_start:],
                      ((0, bp - ts_silence.shape[0]), (0, vp - v)))
    return (emb_pad, sup, ts_tail), (block_v, tail_start, v)


def fused_logit_aggregates(x: jnp.ndarray, prepared, flags: jnp.ndarray, *,
                           ts_begin: int, eot: int,
                           with_grammar: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    """(B, 6) f32 aggregates [m_text, a_text, s_text, m_ts, a_ts, s_ts].

    x: (B, d) current hidden states (post final LN); ``prepared`` from
    :func:`prepare_epilogue_operands`; flags: (4, B) f32 per-row grammar
    state [text_ban, ts_ban, has_ts, ts_floor] (ignored when
    ``with_grammar=False``).
    """
    (emb, sup, ts_tail), (block_v, tail_start, n_vocab) = prepared
    b, d = x.shape
    vp = emb.shape[0]
    bp = ts_tail.shape[0]          # rows pre-padded by prepare (>= 8 mult)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
        flags = jnp.pad(flags, ((0, 0), (0, bp - b)))
    flags_b = jnp.broadcast_to(
        flags.astype(jnp.float32)[:, :, None], (4, bp, 128))

    out = pl.pallas_call(
        partial(_kernel, block_v=block_v, ts_begin=ts_begin, eot=eot,
                n_vocab=n_vocab, tail_start=tail_start,
                with_grammar=with_grammar),
        interpret=interpret,
        grid=(vp // block_v,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, vp - tail_start), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bp, 128), lambda j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((6, bp, 128), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6, bp, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * vp * d,
            bytes_accessed=vp * d * emb.dtype.itemsize + bp * d * 4,
            transcendentals=bp * vp,
        ),
    )(x.astype(emb.dtype), emb, sup, ts_tail, flags_b)
    return out[:, :b, 0].T                                    # (B, 6)


def logit_aggregates_xla(filtered: jnp.ndarray, ts_begin: int) -> jnp.ndarray:
    """(B, 6) aggregates from already-filtered full logits (B, V) — the
    XLA twin of the kernel's reduction, used once per window on the
    prefill logits (i == 0 filters) and as the test reference."""
    v = filtered.shape[-1]
    ids = jnp.arange(v)

    def part(mask):
        fm = jnp.where(mask[None, :], filtered, _MINF)
        m = jnp.max(fm, axis=-1)
        a = jnp.min(jnp.where(fm == m[:, None], ids[None, :], 2 ** 30),
                    axis=-1).astype(jnp.float32)
        s = jnp.sum(jnp.exp(fm - m[:, None]), axis=-1)
        return m, a, s

    m_t, a_t, s_t = part(ids < ts_begin)
    m_s, a_s, s_s = part(ids >= ts_begin)
    return jnp.stack([m_t, a_t, s_t, m_s, a_s, s_s], axis=-1)


def select_from_aggregates(agg: jnp.ndarray, with_grammar: bool = True):
    """Greedy selection from (B, 6) aggregates.

    Returns (next_tok (B,) int32, tok_logprob (B,) f32) — exactly the
    argmax + log_softmax-gather of the filtered logits, including the
    force-timestamp rule (total ts probability beats the best text token
    -> text is banned; reference whisper ApplyTimestampRules tail).
    """
    m_t, a_t, s_t, m_s, a_s, s_s = (agg[:, i] for i in range(6))
    lse_t = m_t + jnp.log(s_t)
    lse_s = m_s + jnp.log(s_s)
    if with_grammar:
        force = lse_s > m_t
    else:
        force = jnp.zeros(m_t.shape, bool)
    text_wins = m_t >= m_s                       # first-max: text ids lower
    next_tok = jnp.where(force, a_s,
                         jnp.where(text_wins, a_t, a_s)).astype(jnp.int32)
    chosen = jnp.where(force, m_s, jnp.maximum(m_t, m_s))
    m_all = jnp.maximum(m_t, m_s)
    lse_all = m_all + jnp.log(s_t * jnp.exp(m_t - m_all)
                              + s_s * jnp.exp(m_s - m_all))
    tok_logprob = chosen - jnp.where(force, lse_s, lse_all)
    return next_tok, tok_logprob


def _epilogue_mode() -> str:
    """'on' | 'off' | 'interpret' for the fused greedy epilogue.

    Default auto-ON on TPU alongside the other fused decode kernels
    (STABLE_TS_TPU_EPI=0 restores the unfused filter chain)."""
    pref = os.environ.get('STABLE_TS_TPU_EPI', 'auto')
    if pref in ('0', 'off', 'false'):
        return 'off'
    if pref in ('interpret', '1', 'on', 'true'):
        return 'interpret' if pref == 'interpret' else 'on'
    from ..models.whisper.model import _FUSED_KERNELS_ENABLED
    return ('on' if _FUSED_KERNELS_ENABLED
            and jax.default_backend() == 'tpu' else 'off')
