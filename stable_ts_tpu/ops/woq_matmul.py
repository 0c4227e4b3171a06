"""Weight-only-quantized (int8) matmul Pallas kernel for TPU.

Why a kernel at all: XLA lowers ``x @ q.astype(bf16)`` by materializing the
dequantized bf16 weight tensor in HBM before the dot (measured: the int8
path is *slower* than plain bf16 weights — 1 byte read + 2 bytes written +
2 bytes re-read per weight, versus 2 bytes read). The whole point of int8
weights on a bandwidth-bound decode step is to halve HBM weight traffic, so
the int8 -> bf16 convert has to happen on-chip: this kernel streams the raw
int8 tile HBM -> VMEM, converts in registers, and feeds the MXU directly.
Per-output-channel scales are applied AFTER the contraction (they factor
out of the K-sum), fused into the same kernel.

Capability context: the reference's dynamic quantization
(stable_whisper/quantization.py:35) relies on torch's qint8 Linear doing
exactly this on CPU; this is the TPU-native equivalent.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['int8_matmul']


def _kernel(x_ref, q_ref, s_ref, out_ref):
    # x: (BM, K) bf16 | q: (K, BN) int8 | s: (1, BN) f32 | out: (BM, BN) f32
    acc = jnp.dot(x_ref[:], q_ref[:].astype(x_ref.dtype),
                  preferred_element_type=jnp.float32)
    out_ref[:] = acc * s_ref[:]


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@partial(jax.jit, static_argnames=('block_n',))
def _int8_matmul_2d(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                    block_n: int = 0) -> jnp.ndarray:
    """(M, K) bf16 @ (K, N) int8 * (1, N) f32 -> (M, N) f32.

    K rides whole into VMEM (Whisper K <= 5120: int8 tile <= 2.6 MB at
    block_n=512, auto double-buffered by the grid pipeline); the grid walks
    M x N output tiles.
    """
    m, k = x.shape
    _, n = q.shape
    if not block_n:
        # Bigger N tiles amortize per-grid-step overhead (measured best at
        # 1024 for K=1280); cap the int8 tile near 2.6 MB so the grid
        # pipeline can double-buffer within VMEM.
        block_n = 1024 if k <= 2048 else 512
    block_m = min(_pad_to(max(m, 16), 16), 256)
    mp, np_ = _pad_to(m, block_m), _pad_to(n, block_n)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        q = jnp.pad(q, ((0, 0), (0, np_ - n)))
        scale = jnp.pad(scale, ((0, 0), (0, np_ - n)))
    import os
    out = pl.pallas_call(
        _kernel,
        interpret=os.environ.get('STABLE_TS_TPU_WOQ') == 'interpret',
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + k * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
    )(x, q, scale)
    return out[:m, :n]


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """``x @ (q * scale)`` with the dequantization fused on-chip.

    x: (..., K) float  |  q: (K, N) int8  |  scale: (1, N) or (N,) f32
    Returns (..., N) float32 (caller casts). Leading axes are flattened into
    the M dimension; Whisper's decode (M = batch) and teacher-forced timing
    (M = batch * ctx) shapes both land on MXU-aligned tiles.
    """
    if x.ndim == 1:
        return int8_matmul(x[None], q, scale)[0]
    lead = x.shape[:-1]
    k = x.shape[-1]
    out = _int8_matmul_2d(x.reshape(-1, k), q, scale.reshape(1, -1))
    return out.reshape(*lead, out.shape[-1])
