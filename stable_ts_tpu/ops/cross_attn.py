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

- **K and V are stored TRANSPOSED** ``(batch, d, S)``. With the head axis
  packed along d (sublanes), a per-head QK^T becomes a broadcast-multiply +
  sublane-group reduction on the VPU — one (d, S_chunk) elementwise pass —
  instead of 2·n_head M=1 MXU matmuls (which are latency-bound garbage at
  batch-of-1 query). The same trick runs softmax·V as a lane reduction.
- **Online softmax over S-chunks** (the flash-attention recurrence) keeps
  the working set at one (d, S_chunk) bf16 product per step, so VMEM holds
  the kernel at any sequence length; S=1500 pads to 1536 and the pad lanes
  are masked to -inf before the running max.
- Per-position dequant scales ``(1, S)`` multiply the (n_head, S) logit
  rows / weight rows directly — they never touch the (d, S) tiles.

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


def _kernel(q_ref, kt_ref, ks_ref, kb_ref, vt_ref, vs_ref, out_ref, *,
            n_head: int):
    d = q_ref.shape[-1]
    d_head = d // n_head
    s_pad = kt_ref.shape[-1]
    n_chunks = s_pad // _S_CHUNK
    i = pl.program_id(0)

    # q/out ride as full (batch, d) arrays — Mosaic requires sublane-dim
    # blocks of >= 8 rows, so a (1, d) per-program row block won't lower;
    # the 80 KB full array is cheaper than re-tiling.
    q = q_ref[pl.ds(i, 1), :].astype(jnp.float32)    # (1, d) row
    q_col = q.reshape(d, 1)

    m_run = jnp.full((n_head, 1), -jnp.inf, jnp.float32)
    l_run = jnp.zeros((n_head, 1), jnp.float32)
    o_run = jnp.zeros((d, 1), jnp.float32)

    for c in range(n_chunks):
        sl = slice(c * _S_CHUNK, (c + 1) * _S_CHUNK)
        kt_c = kt_ref[0, :, sl].astype(jnp.float32)      # (d, S_CHUNK)
        # per-head QK^T: multiply by the query column, then collapse each
        # head's d_head sublanes — (d, S) -> (n_head, d_head, S) -> (n_head, S)
        lg = jnp.sum((kt_c * q_col).reshape(n_head, d_head, _S_CHUNK), axis=1)
        # dequant scales + additive bias (pad positions carry -inf here)
        lg = lg * ks_ref[0, :, sl] + kb_ref[0, :, sl]

        m_new = jnp.maximum(m_run, jnp.max(lg, axis=1, keepdims=True))
        corr = jnp.exp(m_run - m_new)                     # (n_head, 1)
        w = jnp.exp(lg - m_new) * vs_ref[0, :, sl]        # (n_head, S_CHUNK)
        l_run = l_run * corr + jnp.sum(
            jnp.exp(lg - m_new), axis=1, keepdims=True)
        # expand head weights down to per-channel rows and contract over S
        w_d = jnp.broadcast_to(w[:, None, :], (n_head, d_head, _S_CHUNK)
                               ).reshape(d, _S_CHUNK)
        corr_d = jnp.broadcast_to(corr[:, None, :], (n_head, d_head, 1)
                                  ).reshape(d, 1)
        vt_c = vt_ref[0, :, sl].astype(jnp.float32)
        o_run = o_run * corr_d + jnp.sum(w_d * vt_c, axis=1, keepdims=True)
        m_run = m_new

    l_d = jnp.broadcast_to(l_run[:, None, :], (n_head, d_head, 1)).reshape(d, 1)
    out_ref[pl.ds(i, 1), :] = (o_run / l_d).reshape(1, d)


def _pad_s(s: int) -> int:
    return (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK


@partial(jax.jit, static_argnames=('n_head',))
def _call(q, kt, ks, kb, vt, vs, n_head: int):
    import os
    b, d, s_pad = kt.shape
    kernel = partial(_kernel, n_head=n_head)
    vec = pl.BlockSpec((1, 1, s_pad), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, d, s_pad), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=os.environ.get('STABLE_TS_TPU_CROSS') == 'interpret',
        grid=(b,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            mat, vec, vec, mat, vec,
        ],
        out_specs=pl.BlockSpec((b, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * d * s_pad,
            bytes_accessed=2 * b * d * s_pad * kt.dtype.itemsize + b * d * 4,
            transcendentals=b * n_head * s_pad,
        ),
    )(q, kt, ks, kb, vt, vs)


def cross_attn_decode(q: jnp.ndarray, kt: jnp.ndarray, ks: jnp.ndarray,
                      kb: jnp.ndarray, vt: jnp.ndarray,
                      vs: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """One decode step of cross-attention against transposed K/V.

    q:  (batch, d) query at the current position, ALREADY scaled by
        d_head**-0.5 (the kernel applies no further scaling).
    kt/vt: (batch, d, S_pad) keys/values transposed, int8 or float;
        S_pad must be a multiple of 512.
    ks/vs: (batch, 1, S_pad) per-position dequant scales (ones when kt/vt
        are unquantized floats).
    kb: (batch, 1, S_pad) additive logit bias — 0 on real key positions,
        -inf on padding (the mask is baked at precompute time).
    Returns (batch, d) float32 attention output (pre out-projection).
    """
    return _call(q, kt, ks, kb, vt, vs, n_head)
