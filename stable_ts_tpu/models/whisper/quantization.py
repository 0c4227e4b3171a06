"""int8 weight-only quantization for the Whisper linear layers, TPU-native.

Capability-equivalent of the reference's dynamic quantization
(stable_whisper/quantization.py:35 ``ptdq_linear`` — torch qint8 dynamic
quantization of every Linear, CPU-only). Re-designed for XLA/TPU:

- **Weight-only, symmetric, per-output-channel.** Each linear weight
  ``w (…, in, out)`` is stored as int8 ``q`` plus an f32 ``scale`` per output
  channel (amax/127). Activations stay bf16/f32 — on TPU the win is halving
  (vs bf16) or quartering (vs f32) HBM traffic and footprint for the
  weight-streaming-bound decoder steps, not integer compute.
- **Dequant fuses into the matmul.** ``QuantizedArray.dequantize()`` is
  ``q.astype(compute_dtype) * scale`` right before ``jnp.dot``; XLA fuses the
  cast+multiply into the MXU operand read, so there is no materialized f32
  copy of the weights in HBM.
- **Pytree-transparent.** ``QuantizedArray`` is a registered pytree node, so
  quantized params flow through jit/pjit/device_put unchanged and
  ``model.linear`` only needs a ``dequantize`` duck-type check.

Like the reference (which quantizes Linear but not Conv1d/embeddings), only
the attention q/k/v/out and MLP fc1/fc2 projections are quantized; conv
stems, embeddings, and layer norms keep their original dtype.
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

# parent keys whose 'w' leaf is a linear projection weight
_LINEAR_KEYS = frozenset({'q', 'k', 'v', 'out', 'fc1', 'fc2'})


@jax.tree_util.register_pytree_node_class
class QuantizedArray:
    """int8 tensor + per-output-channel scale, presenting the logical shape."""

    def __init__(self, q: jnp.ndarray, scale: jnp.ndarray,
                 compute_dtype=jnp.bfloat16):
        self.q = q
        self.scale = scale
        self.compute_dtype = compute_dtype

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.q, self.scale), (self.compute_dtype,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, compute_dtype=aux[0])

    # -- array-ish surface -------------------------------------------------
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        return self.compute_dtype

    def dequantize(self) -> jnp.ndarray:
        return (self.q.astype(self.compute_dtype)
                * self.scale.astype(self.compute_dtype))

    def astype(self, dtype):
        return QuantizedArray(self.q, self.scale, compute_dtype=dtype)

    def __repr__(self):
        return (f'QuantizedArray(int8 {tuple(self.q.shape)}, '
                f'compute={jnp.dtype(self.compute_dtype).name})')


def quantize_weight(w: jnp.ndarray, compute_dtype=jnp.bfloat16) -> QuantizedArray:
    """Symmetric int8 quantization with one scale per output channel.

    ``w`` is (…, in, out) — possibly with a leading stacked-layer axis — so
    the reduction runs over the input axis (-2) only: each output channel
    (and each layer in the stack) gets its own scale.
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantizedArray(q, scale, compute_dtype=compute_dtype)


def quantize_tensor(x: jnp.ndarray, reduce_axis: int = -1,
                    compute_dtype=jnp.bfloat16, bits: int = 8) -> QuantizedArray:
    """Symmetric intN quantization of an activation tensor.

    ``reduce_axis`` is the axis folded into each scale — e.g. for a cross-KV
    tensor (layers, batch, positions, d) use ``reduce_axis=-1`` so every
    position gets its own scale (the d-axis is what attention sums over, and
    per-position scales factor cleanly out of both the QK^T and the
    attn @ V matmuls).

    ``bits=4`` snaps to the int4 grid ([-7, 7], amax/7 scales) but stores
    UNPACKED int8 — numerically identical to the fused kernel's packed int4
    tiles (model.py:precompute_cross_kv_t), so the unfused debug path and
    equivalence tests see the same grid without nibble plumbing.
    """
    qmax = float(2 ** (bits - 1) - 1)
    x32 = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=reduce_axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    q = jnp.clip(jnp.round(x32 / scale), -qmax, qmax).astype(jnp.int8)
    return QuantizedArray(q, scale, compute_dtype=compute_dtype)


def quantize_params(params: Dict[str, Any], compute_dtype=jnp.bfloat16,
                    _parent: Optional[str] = None) -> Dict[str, Any]:
    """Return a copy of a Whisper params pytree with every linear projection
    weight replaced by a ``QuantizedArray``. Biases, norms, convs, and
    embeddings are untouched."""
    out = {}
    for key, value in params.items():
        if isinstance(value, dict):
            out[key] = quantize_params(value, compute_dtype, _parent=key)
        elif key == 'w' and _parent in _LINEAR_KEYS and getattr(value, 'ndim', 0) >= 2:
            out[key] = quantize_weight(value, compute_dtype)
        else:
            out[key] = value
    return out


def dequantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`quantize_params` (lossy): materialize plain arrays."""
    return jax.tree.map(
        lambda leaf: leaf.dequantize() if isinstance(leaf, QuantizedArray) else leaf,
        params, is_leaf=lambda leaf: isinstance(leaf, QuantizedArray))


def quantized_bytes(params: Dict[str, Any]) -> int:
    """Total parameter bytes (int8 + scales counted at their true widths)."""
    total = 0
    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, QuantizedArray)):
        if isinstance(leaf, QuantizedArray):
            total += leaf.q.size * 1 + leaf.scale.size * 4
        else:
            total += leaf.size * jnp.dtype(leaf.dtype).itemsize
    return total
