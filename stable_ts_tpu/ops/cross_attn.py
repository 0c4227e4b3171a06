"""Fused cross-attention decode kernel (Pallas, TPU).

Whisper's incremental decode reads the ENTIRE precomputed cross-attention
K/V (n_layers, batch, 1500, d) every token step — the single largest HBM
stream of the sampler (at large-v3 b16: ~2 GB/step as int8, ~4 GB as bf16).
The unfused path (models/whisper/model.py:_mha with ``kv_override``) pays
that stream three times over: XLA materializes the dequantized bf16 K and V
copies, then the QK^T logits, then re-reads them for softmax·V. This kernel
does the whole read once:

    int8 K^T/V^T tile --DMA--> VMEM --dequant in registers--> QK^T
    -> online softmax -> ·V accumulate            (nothing back to HBM)

Design notes (why it looks the way it does):

- **K and V are stored TRANSPOSED** ``(batch, d, S)`` and consumed as int8
  by the MXU directly — no dequantized copy ever exists.
- **Block-diagonal MXU contraction.** Per-head QK^T at a batch-of-1 query
  is 2·n_head M=1 matmuls — latency-bound garbage on a systolic array.
  Embedding q into an (n_head, d) matrix that is zero outside each head's
  d_head block turns QK^T into ONE (n_head, d)x(d, S) matmul and softmax·V
  into ONE (n_head, S)x(S, d)^T matmul whose diagonal blocks are the
  answer. The n_head-fold wasted FLOPs are free (the kernel is bandwidth-
  bound); measured 1.4x over a VPU broadcast-multiply formulation and 2.8x
  over the unfused XLA path.
- Per-position dequant scales ``(1, S)`` multiply the (n_head, S) logit
  rows / weight rows directly — they never touch the (d, S) tiles. The
  (n_head, S) working set is tiny, so the whole padded S rides in one pass
  (no online-softmax chunking needed).

Quantization context: reference stable-ts has no KV quantization at all
(its decode keeps float K/V); this kernel is what makes int8 cross-KV
actually pay on TPU.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['cross_attn_decode']

_S_CHUNK = 512


def _kernel(scalars_ref, q_ref, kv_ref, sc_ref, out_ref, *,
            n_head: int, q_per_kv: int, g_pad: int, bits: int):
    d = q_ref.shape[-1]
    s_pad = kv_ref.shape[-1]
    d_head = d // n_head
    i = pl.program_id(0)
    g = q_per_kv
    # K^T / V^T and their dequant scales ride as TWO stacked operands
    # (not five): fewer refs per grid step = fewer per-step DMA
    # descriptors, and the pad-mask bias is built in-kernel from the
    # prefetched real length instead of streaming an (1, S) row.
    kt = kv_ref[0, 0, 0]                                     # (d, S)
    vt = kv_ref[0, 0, 1]
    if bits == 4:
        # int4 tiles arrive HALF-HEIGHT (d/2, S): row r carries dim r in its
        # low nibble and dim r + d/2 in its high nibble (split-half packing —
        # an interleaved layout would need a sublane shuffle to undo; the
        # split halves undo with one concatenate). Unpacking costs VPU
        # shifts on a VMEM-resident tile; what it buys is HALVING the
        # kernel's HBM stream, which is what the whole step is bound by.
        def _unpack(p):
            p32 = p.astype(jnp.int32)
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(p32, 28), 28)
            hi = jax.lax.shift_right_arithmetic(p32, 4)
            return jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)

        kt = _unpack(kt)                                     # (d, S) bf16
        vt = _unpack(vt)
    ks = sc_ref[0, 0, 0]                                     # (1, S)
    vs = sc_ref[0, 0, 1]
    s_real = scalars_ref[1]
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    kb = jnp.where(key_pos < s_real, 0.0, -jnp.inf).astype(jnp.float32)

    # Block-diagonal MXU formulation. Per-head QK^T has a block-diagonal
    # contraction structure (head h contracts only its own d_head slice);
    # embedding q into an (n_head, d) matrix that is zero off its head's
    # block turns both attention contractions into ONE MXU matmul each —
    # measured 1.4x over the VPU broadcast-multiply/segment-reduce
    # formulation, and the MXU consumes the int8 K/V tiles directly (no
    # dequantized copy exists anywhere). The n_head x waste FLOPs are free:
    # the kernel is bandwidth/latency-bound, not FLOP-bound.
    #
    # ``q_per_kv = g > 1`` (beam search / best_of): g query rows share one
    # K/V tile — the program's q rows embed into a (g_pad*n_head, d) matrix
    # (query row r of the group occupies rows [r*n_head, (r+1)*n_head)),
    # so the dominant K/V stream is read once per GROUP instead of once
    # per beam. The beam axis arrives PRE-BLOCKED as (b, g_pad, d) with
    # g_pad a sublane multiple — Mosaic cannot lower a dynamic-start
    # sublane slice at stride g, so the host reshapes instead.
    if g == 1:
        # q/out ride as full (rows, d) arrays — Mosaic requires sublane-dim
        # blocks of >= 8 rows, so a (1, d) per-program row block won't
        # lower; the full array is cheaper than re-tiling.
        qrows = q_ref[pl.ds(i, 1), :].astype(jnp.float32)    # (1, d)
        rows_blk = n_head
        col_head = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, d), 1) // d_head
        row_head = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, d), 0) % n_head
        hmask = (col_head == row_head).astype(jnp.float32)
        qblk = (hmask * qrows).astype(jnp.bfloat16)          # (H, d)
    else:
        qrows = q_ref[0].astype(jnp.float32)                 # (g_pad, d)
        rows_blk = g_pad * n_head
        col_head = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, d), 1) // d_head
        row_head = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, d), 0) % n_head
        hmask = (col_head == row_head).astype(jnp.float32)   # (g_pad*H, d)
        # scatter the g_pad query rows onto their n_head row blocks
        row_q = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, g_pad), 0) // n_head
        col_q = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, g_pad), 1)
        expand = (row_q == col_q).astype(jnp.float32)        # (g_pad*H, g_pad)
        qblk = (hmask * jax.lax.dot_general(
            expand, qrows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(jnp.bfloat16)

    lg = jax.lax.dot_general(qblk, kt, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (rows, S)
    # dequant scales + additive bias (pad positions carry -inf)
    lg = lg * ks + kb
    m = jnp.max(lg, axis=1, keepdims=True)
    w = jnp.exp(lg - m)
    l = jnp.sum(w, axis=1, keepdims=True)
    wv = (w * vs).astype(jnp.bfloat16)                        # (rows, S)
    o2 = jax.lax.dot_general(wv, vt, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (rows, d)
    if g == 1:
        o = jnp.sum(o2 * hmask, axis=0, keepdims=True)     # diag blocks
        l_d = jnp.sum(hmask * l, axis=0, keepdims=True)
        out_ref[pl.ds(i, 1), :] = o / l_d
    else:
        # fold the n_head row blocks of each query row back to its d columns
        o = jax.lax.dot_general(expand, o2 * hmask, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (g_pad, d)
        l_d = jax.lax.dot_general(expand, hmask * l, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[0] = o / l_d


def _pad_s(s: int) -> int:
    return (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK


@partial(jax.jit, static_argnames=('n_head', 'q_per_kv', 'bits'))
def _call(scalars, q, kv, sc, n_head: int, q_per_kv: int, bits: int):
    import os
    n_layers, b, _, d_kv, s_pad = kv.shape
    d = q.shape[-1]          # == d_kv except int4, where tiles are d/2 tall
    rows = q.shape[0] if q.ndim == 2 else b * q_per_kv
    g = q_per_kv
    g_pad = (g + 7) // 8 * 8 if g > 1 else 1
    kernel = partial(_kernel, n_head=n_head, q_per_kv=g, g_pad=g_pad,
                     bits=bits)
    # The layer index arrives via scalar prefetch and steers the leading
    # block axis, so the kernel DMAs the layer's tiles straight out of the
    # FULL (L, B, 2, d, S) stack — the per-layer scan-xs dynamic_slice copy
    # that used to precede every launch never exists.
    vec = pl.BlockSpec((1, 1, 2, 1, s_pad), lambda i, s: (s[0], i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, 1, 2, d_kv, s_pad), lambda i, s: (s[0], i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    if g > 1:
        # beam layout: (b, g_pad, d) blocks, one sublane-aligned block per
        # program (a dynamic-start (g, d) slice at stride g won't lower)
        q = jnp.pad(q.reshape(b, g, d), ((0, 0), (0, g_pad - g), (0, 0)))
        q_spec = pl.BlockSpec((1, g_pad, d), lambda i, s: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, g_pad, d), lambda i, s: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, g_pad, d), jnp.float32)
    else:
        q_spec = pl.BlockSpec((rows, d), lambda i, s: (0, 0),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((rows, d), lambda i, s: (0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((rows, d), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[q_spec, mat, vec],
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        kernel,
        interpret=os.environ.get('STABLE_TS_TPU_CROSS') == 'interpret',
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * d * s_pad,
            bytes_accessed=2 * b * d_kv * s_pad * kv.dtype.itemsize + rows * d * 4,
            transcendentals=rows * n_head * s_pad,
        ),
    )(scalars, q, kv, sc)
    if g > 1:
        out = out[:, :g].reshape(rows, d)
    return out


def cross_attn_decode(q: jnp.ndarray, kv: jnp.ndarray, sc: jnp.ndarray,
                      n_head: int, s=None,
                      q_per_kv: int = 1, layer_idx=None,
                      bits: int = 8) -> jnp.ndarray:
    """One decode step of cross-attention against transposed K/V.

    q:  (rows, d) queries at the current position, ALREADY scaled by
        d_head**-0.5 (the kernel applies no further scaling);
        rows = batch * q_per_kv.
    kv: (batch, 2, d, S_pad) keys/values stacked ([:, 0] = K^T, [:, 1] =
        V^T), int8 or float; S_pad must be a multiple of 512. int4 packing
        (model.py:precompute_cross_kv_t quantize=4) arrives as int8 tiles of
        HALF height (batch, 2, d/2, S_pad) — row r holds dim r in its low
        nibble and dim r + d/2 in its high nibble; the kernel unpacks in
        VMEM, so the HBM stream (what the step is bound by) halves. With
        ``layer_idx`` given, the FULL layer stack (n_layers, batch, 2, d,
        S_pad) instead — the prefetched scalar picks the layer's tiles
        inside the kernel, so no host/XLA slice copy of the layer ever
        exists (decoder_step passes the whole stack from its scan body).
    sc: (batch, 2, 1, S_pad) per-position dequant scales for K and V
        (ones when kv is unquantized float); (n_layers, batch, 2, 1,
        S_pad) with ``layer_idx``. The K/V tiles and their scales ride as
        two stacked operands rather than five separate refs — fewer DMA
        descriptors per grid step.
    s: real (unpadded) key length — key positions >= s are masked with an
        in-kernel -inf bias (None -> no padding, all S_pad positions real).
    q_per_kv: consecutive query rows sharing each K/V batch row (beam
        search / best_of sampling: all beams of a window attend to the same
        encoder output, so the K/V tile streams from HBM ONCE per group).
    layer_idx: int32 scalar selecting the layer when the operands carry the
        full stack; None -> operands are single-layer 4D.
    Returns (rows, d) float32 attention output (pre out-projection).
    """
    if layer_idx is None:
        kv, sc = kv[None], sc[None]
        layer_idx = 0
    if s is None:
        s = kv.shape[-1]
    # The caller states the packing explicitly (bits=4 <=> split-half nibble
    # tiles, carried as the 'kvT4' pytree key upstream); validate it against
    # the static tile shapes rather than inferring — a layout whose K/V head
    # dim legitimately differs from the query dim must be rejected, never
    # silently misdecoded as packed nibbles.
    if bits == 4:
        if kv.dtype != jnp.int8 or kv.shape[-2] * 2 != q.shape[-1]:
            raise ValueError(
                f'bits=4 expects half-height int8 tiles (d/2={q.shape[-1] // 2}'
                f' rows), got {kv.dtype} tiles of {kv.shape[-2]} rows')
    elif kv.shape[-2] != q.shape[-1]:
        raise ValueError(
            f'K/V tile height {kv.shape[-2]} != query dim {q.shape[-1]} '
            f'(pass bits=4 for split-half packed int4 tiles)')
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(s, jnp.int32)])
    return _call(scalars, q, kv, sc, n_head, q_per_kv, bits)
