"""Streaming vocab-projection Pallas kernel for the decode step.

The per-token logits matmul is tiny in M (the batch, 8-80 rows) and huge in
N (the 51 k-token vocab): ``x (M, d) @ token_emb.T (d, V)``. Its cost is
pure HBM bandwidth — the bf16 embedding table is ~133 MB for large-v3 —
yet the XLA lowering of this shape measures ~4x its stream floor on the
v5e (0.68 ms vs 0.16 ms at M=16, tools/probe_phase.py): with M this small
the fused transpose + f32 accumulation schedule XLA picks does not keep the
HBM pipe saturated.

This kernel walks the table in row tiles exactly as stored — (block_v, d)
blocks of the (V, d) embedding, contracting d via dot_general so no
transposed copy of the table exists anywhere — with x resident in VMEM
across the whole grid. Each grid step streams one tile and emits the
matching (M, block_v) f32 logit slab; the grid pipeline double-buffers the
tile fetches, which is all the schedule this shape needs.

Capability context: the reference leaves this to torch's tied-embedding
``logits = x @ emb.T`` (stable_whisper has no counterpart op; it inherits
whisper/model.py). The decode loops call this through
``model._vocab_logits`` when the fused-kernel path is on.
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['vocab_logits_kernel']


def _kernel(x_ref, emb_ref, out_ref):
    # x: (MP, K) bf16 | emb: (BV, K) bf16 | out: (MP, BV) f32
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], emb_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@partial(jax.jit, static_argnames=('block_v',))
def vocab_logits_kernel(x: jnp.ndarray, emb: jnp.ndarray,
                        block_v: int = 0) -> jnp.ndarray:
    """``x @ emb.T``: (M, K) bf16 x (V, K) bf16 -> (M, V) f32."""
    m, k = x.shape
    v, _ = emb.shape
    if not block_v:
        # ~2.6 MB bf16 tile at d=1280: big enough to amortize grid-step
        # overhead, small enough for the pipeline to double-buffer in VMEM
        # (same operating point as ops/woq_matmul.py; >= 4096 rows at
        # d=1280 blows the 16 MB scoped-VMEM limit once double-buffered).
        # STABLE_TS_TPU_VOCAB_BV overrides for experiments (trace-time).
        block_v = (int(os.environ.get('STABLE_TS_TPU_VOCAB_BV', '0'))
                   or (1024 if k <= 2048 else 512))
    mp = _pad_to(max(m, 8), 8)
    vp = _pad_to(v, block_v)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if vp != v:
        emb = jnp.pad(emb, ((0, vp - v), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        interpret=os.environ.get('STABLE_TS_TPU_VOCAB') == 'interpret',
        grid=(vp // block_v,),
        in_specs=[
            pl.BlockSpec((mp, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_v, k), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, block_v), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, vp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * vp * k,
            bytes_accessed=mp * k * 2 + vp * k * 2 + mp * vp * 4,
            transcendentals=0,
        ),
    )(x, emb)
    return out[:m, :v]
