"""Whisper encoder-decoder in pure functional JAX.

Architecture-equivalent to OpenAI Whisper (the reference drives that model
through torch at e.g. timing.py:58-64 and decode.py:33-65), re-designed for
XLA/TPU:

- **No modules, no hooks.** A model is (ModelDimensions, params pytree); all
  applies are pure jit-able functions. Cross-attention QK logits — which the
  reference harvests with forward hooks (timing.py:50-57) — are returned as
  explicit aux outputs of the decoder apply.
- **Layers are scanned.** Per-layer params are stacked along a leading axis
  and blocks run under ``lax.scan``: one compiled block body regardless of
  depth, fast compiles, and clean pjit sharding of the stacked leaves.
- **Static shapes.** Audio is always a (batch, n_mels, 3000) window; the
  decoder KV cache is fixed (n_text_ctx) with a position index, so the
  sampling loop is a ``lax.while_loop`` with zero dynamic shapes.
- Matmuls carry ``preferred_element_type=float32`` so bf16 params still
  accumulate in f32 on the MXU.
"""
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclass(frozen=True)
class ModelDimensions:
    n_mels: int
    n_audio_ctx: int
    n_audio_state: int
    n_audio_head: int
    n_audio_layer: int
    n_vocab: int
    n_text_ctx: int
    n_text_state: int
    n_text_head: int
    n_text_layer: int

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.n_vocab - 51765 - int(self.is_multilingual)


# -- primitive layers -----------------------------------------------------------------

def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * g + b).astype(x.dtype)


def _woq_mode() -> str:
    """How quantized linears multiply: 'dyn' (int8 activations x int8
    weights on the MXU — the fastest measured path and the same recipe as
    the reference's torch dynamic quantization), 'pallas' (weight-only
    Pallas kernel, ops/woq_matmul.py), or 'astype' (plain XLA fallback —
    the only one that traces on CPU without the interpreter)."""
    import os
    pref = os.environ.get('STABLE_TS_TPU_WOQ', 'auto')
    if pref in ('0', 'off', 'false', 'astype'):
        return 'astype'
    if pref in ('pallas', 'interpret'):
        return 'pallas'
    if pref in ('dyn', '1', 'on', 'true'):
        return 'dyn'
    # 'dyn' is a plain dot_general — it partitions cleanly under pjit and
    # needs no fused-kernel gating
    return 'dyn' if jax.default_backend() == 'tpu' else 'astype'


def linear(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if hasattr(w, 'q'):  # int8 QuantizedArray (quantization.py)
        mode = _woq_mode() if w.q.ndim == 2 else 'astype'
        if mode == 'dyn':
            # Dynamic activation quantization + native int8 MXU matmul.
            # XLA's lowering of x @ q.astype(bf16) materializes a bf16
            # weight copy in HBM (measured SLOWER than unquantized bf16);
            # with both operands int8 the MXU consumes the weight tensor
            # directly — measured 1.3x over bf16 weights at decode shapes.
            # Per-row activation scales keep the product exact to ~1e-2
            # relative (the reference's torch qint8 dynamic quantization
            # makes the same activation-precision tradeoff).
            x32 = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
            xs = jnp.where(amax > 0, amax / 127.0, 1.0)
            xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, w.q, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = y.astype(jnp.float32) * xs * w.scale
            if b is not None:
                out = out + b
            return out.astype(x.dtype)
        if mode == 'pallas':
            # Weight-only Pallas kernel: int8 weights stream HBM -> VMEM
            # and dequantize in registers; activations stay float.
            from ...ops.woq_matmul import int8_matmul
            out = int8_matmul(x, w.q, w.scale)
            if b is not None:
                out = out + b
            return out.astype(x.dtype)
        # Fallback (CPU / stacked weights): rescale AFTER the matmul so the
        # dot's weight operand is the int8 tensor itself.
        out = jnp.dot(x, w.q.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        out = out * w.scale
        if b is not None:
            out = out + b
        return out.astype(x.dtype)
    out = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def _vocab_proj_mode() -> str:
    """Streaming vocab-projection kernel (ops/vocab_proj.py): 'on' | 'off'
    | 'interpret'. Default OFF — measured (tools/probe_vocab.py, v5e
    large-v3 b16): isolated it beats the XLA matmul ~9x, but inside the
    sampling while_loop the full step got SLOWER at every tiling (7.72-7.87
    vs 7.20 ms/step) — XLA overlaps/fuses the in-loop matmul with the
    filter chain, and the pallas_call boundary serializes it. Kept for
    experiments and for the standalone detect-language path."""
    import os
    pref = os.environ.get('STABLE_TS_TPU_VOCAB', 'off')
    if pref in ('0', 'off', 'false', 'auto'):
        return 'off'
    return 'interpret' if pref == 'interpret' else 'on'


def _vocab_logits(x: jnp.ndarray, token_emb: jnp.ndarray) -> jnp.ndarray:
    """Tied-embedding vocab projection: x @ token_emb.T without the
    transpose — a dot_general contracting the shared d axis so no
    (d, n_vocab) transposed copy of the 100+ MB embedding can ever
    materialize. Decode-step shapes (2-D x with few rows) route to the
    streaming Pallas kernel when enabled; teacher-forced / prefill shapes
    (large M, MXU-bound) stay on XLA, which schedules them well."""
    if (x.ndim == 2 and x.shape[0] <= 256 and token_emb.shape[0] >= 2048
            and _vocab_proj_mode() != 'off'):
        from ...ops.vocab_proj import vocab_logits_kernel
        return vocab_logits_kernel(x.astype(token_emb.dtype), token_emb)
    return jax.lax.dot_general(
        x, token_emb, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper's encoder positional embedding (sin/cos halves)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)],
                          axis=1).astype(np.float32)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def qkv_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, n_head: int,
                  mask: Optional[jnp.ndarray] = None,
                  return_qk: bool = False):
    """Scaled dot-product attention; optionally returns pre-softmax QK logits.

    q/k/v: (batch, seq, d). Scaling follows Whisper: q and k each scaled by
    (d_head)^-0.25 so the logit scale matches 1/sqrt(d_head).
    """
    d_head = q.shape[-1] // n_head
    scale = d_head ** -0.25
    qh = _split_heads(q, n_head) * scale
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)
    logits = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = logits + mask
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhqk,bhkd->bhqd', weights, vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    out = _merge_heads(out)
    return (out, logits) if return_qk else (out, None)


def _mha(params: Params, x: jnp.ndarray, xa: Optional[jnp.ndarray], n_head: int,
         mask: Optional[jnp.ndarray] = None,
         kv_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
         return_qk: bool = False,
         q_override: Optional[jnp.ndarray] = None):
    """One multi-head attention: self (xa=None) or cross (xa=encoder out).

    ``kv_override`` supplies precomputed (k, v) — used for cached
    cross-attention and for KV-cached self-attention. ``q_override``
    supplies an already-projected query (the fused-QKV decode path).
    """
    q = (q_override if q_override is not None
         else linear(x, params['q']['w'], params['q']['b']))
    if kv_override is not None:
        k, v = kv_override
        if hasattr(k, 'dequantize'):  # int8 KV (quantization.py)
            k = k.dequantize()
        if hasattr(v, 'dequantize'):
            v = v.dequantize()
    else:
        src = x if xa is None else xa
        k = linear(src, params['k']['w'])  # no bias on key (Whisper convention)
        v = linear(src, params['v']['w'], params['v']['b'])
    out, qk = qkv_attention(q, k, v, n_head, mask=mask, return_qk=return_qk)
    return linear(out, params['out']['w'], params['out']['b']), qk, (k, v)


def _mlp(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = gelu(linear(x, params['fc1']['w'], params['fc1']['b']))
    return linear(h, params['fc2']['w'], params['fc2']['b'])


# -- encoder ----------------------------------------------------------------------------

def _flash_self_attention(params: Params, x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """Encoder self-attention via the Pallas flash kernel (TPU).

    The naive path materializes (B, H, 1500, 1500) f32 logits — ~1.4 GB of
    HBM traffic per large-v3 layer, which is what makes the encoder
    memory-bound. Flash attention streams K/V blocks through VMEM instead.
    Sequence is padded 1500 -> 1536; segment ids mask real-vs-pad so padded
    keys never contribute to the softmax.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    q = linear(x, params['q']['w'], params['q']['b'])
    k = linear(x, params['k']['w'])
    v = linear(x, params['v']['w'], params['v']['b'])
    b, s, d = q.shape
    d_head = d // n_head
    pad = (-s) % 128

    def heads(t):
        t = t.reshape(b, s, n_head, d_head).transpose(0, 2, 1, 3)
        return jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0)))

    seg = jnp.pad(jnp.ones((b, s), jnp.int32), ((0, 0), (0, pad)),
                  constant_values=2)
    # Full-sequence blocks: at Whisper's S=1536 the whole K/V tile fits
    # VMEM (1536 x 64 bf16 = 192 KB/head), and one-block streaming measures
    # 6x faster than the kernel's default 512/1024 tiling (4.0 vs 24.8
    # ms/layer for large-v3 at batch 16).
    sp = s + pad
    # Backward (dkv/dq) kernels keep smaller tiles: the dq kernel's scratch
    # grows with block_q_dq * block_k_dq and a full-sequence 1536x1536 tile
    # overflows the 16 MB VMEM scoped allocation during the train step.
    bp = min(sp, 512)
    bs = BlockSizes(block_q=sp, block_k_major=sp, block_k=sp, block_b=1,
                    block_q_major_dkv=bp, block_k_major_dkv=bp,
                    block_k_dkv=bp, block_q_dkv=bp,
                    block_k_major_dq=bp, block_k_dq=bp, block_q_dq=bp)
    out = flash_attention(heads(q), heads(k), heads(v),
                          segment_ids=SegmentIds(seg, seg),
                          sm_scale=d_head ** -0.5, block_sizes=bs)
    out = out[:, :, :s].transpose(0, 2, 1, 3).reshape(b, s, d).astype(x.dtype)
    return linear(out, params['out']['w'], params['out']['b'])


_FUSED_KERNELS_ENABLED = True


def set_fused_kernels_enabled(on: bool) -> None:
    """Process-wide gate for the custom Pallas kernels (flash attention,
    fused cross-attention decode, WOQ matmul).

    ``WhisperTPU.shard()`` turns them OFF when the parameters go onto a
    multi-device mesh: a ``pallas_call`` inside jit has no partitioning
    rule, so XLA would gather its sharded operands onto one device —
    correct but serializing. The sharded path keeps the plain XLA
    formulations, which partition cleanly."""
    global _FUSED_KERNELS_ENABLED
    _FUSED_KERNELS_ENABLED = on


def fused_kernels_enabled() -> bool:
    return _FUSED_KERNELS_ENABLED


def _use_flash_attention() -> bool:
    import os
    pref = os.environ.get('STABLE_TS_TPU_FLASH', 'auto')
    if pref in ('0', 'off', 'false'):
        return False
    if pref in ('1', 'on', 'true'):
        return True
    return _FUSED_KERNELS_ENABLED and jax.default_backend() == 'tpu'


def _self_fa_mode() -> str:
    """Fused self-attention decode kernel (ops/self_attn.py): 'on' | 'off'
    | 'interpret'. Default on for TPU — it reads each layer's K/V cache
    slab once where the XLA path materializes slice copies (measured 5.98
    -> ~1.5 ms/step at large-v3 b16)."""
    import os
    pref = os.environ.get('STABLE_TS_TPU_SELF', 'auto')
    if pref in ('0', 'off', 'false'):
        return 'off'
    if pref in ('interpret', '1', 'on', 'true'):
        return 'interpret' if pref == 'interpret' else 'on'
    return ('on' if _FUSED_KERNELS_ENABLED
            and jax.default_backend() == 'tpu' else 'off')


def _flash_cross_attention(params: Params, x: jnp.ndarray, xa: jnp.ndarray,
                           n_head: int,
                           capture_heads: Optional[jnp.ndarray] = None):
    """Teacher-forced cross-attention via the Pallas flash kernel.

    The naive path materializes (B, H, T, 1500) f32 logits per layer just to
    throw away all but the ~1 alignment head's rows after softmax — at
    large-v3 b16 T=256 that is ~0.5 GB written+read per layer. Flash streams
    K/V through VMEM for the attention OUTPUT; the captured heads' raw QK
    logits (what the DTW word-timing consumes) are recomputed separately as
    one (B, n_sel, T, S) einsum over just those heads.

    Returns (attention output (B, T, d), captured logits or None) — captured
    logits match qkv_attention's scaling (q and k each scaled dh**-0.25).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    q = linear(x, params['q']['w'], params['q']['b'])
    k = linear(xa, params['k']['w'])
    v = linear(xa, params['v']['w'], params['v']['b'])
    b, t, d = q.shape
    s = xa.shape[1]
    d_head = d // n_head
    pad_t = (-t) % 128
    pad_s = (-s) % 128

    def heads(z, pad):
        z = z.reshape(b, z.shape[1], n_head, d_head).transpose(0, 2, 1, 3)
        return jnp.pad(z, ((0, 0), (0, 0), (0, pad), (0, 0)))

    qh, kh, vh = heads(q, pad_t), heads(k, pad_s), heads(v, pad_s)
    seg_q = jnp.pad(jnp.ones((b, t), jnp.int32), ((0, 0), (0, pad_t)),
                    constant_values=2)
    seg_kv = jnp.pad(jnp.ones((b, s), jnp.int32), ((0, 0), (0, pad_s)),
                     constant_values=2)
    tp, sp = t + pad_t, s + pad_s
    bq, bk = min(tp, 512), min(sp, 1536)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=min(tp, 512), block_k_major_dkv=min(sp, 512),
                    block_k_dkv=min(sp, 512), block_q_dkv=min(tp, 512),
                    block_k_major_dq=min(sp, 512), block_k_dq=min(sp, 512),
                    block_q_dq=min(tp, 512))
    out = flash_attention(qh, kh, vh, segment_ids=SegmentIds(seg_q, seg_kv),
                          sm_scale=d_head ** -0.5, block_sizes=bs)
    out = out[:, :, :t].transpose(0, 2, 1, 3).reshape(b, t, d).astype(x.dtype)
    out = linear(out, params['out']['w'], params['out']['b'])

    qk_sel = None
    if capture_heads is not None:
        scale = d_head ** -0.25
        q_sel = jnp.take(qh[:, :, :t], capture_heads, axis=1) * scale
        k_sel = jnp.take(kh[:, :, :s], capture_heads, axis=1) * scale
        qk_sel = jnp.einsum('bntd,bnsd->bnts', q_sel.astype(jnp.float32),
                            k_sel.astype(jnp.float32))
    return out, qk_sel

def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x: (batch, channels, time); w: (width, in, out)."""
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=('NCH', 'HIO', 'NCH'),
        preferred_element_type=jnp.float32,
    )
    return (out + b[None, :, None]).astype(x.dtype)


@partial(jax.jit, static_argnames=('n_head',))
def encoder_apply(params: Params, mel: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """mel: (batch, n_mels, 3000) -> (batch, 1500, n_state)."""
    mel = mel.astype(params['conv1']['w'].dtype)  # f32 mel + bf16 params
    x = gelu(_conv1d(mel, params['conv1']['w'], params['conv1']['b'], stride=1))
    x = gelu(_conv1d(x, params['conv2']['w'], params['conv2']['b'], stride=2))
    x = x.transpose(0, 2, 1)  # (batch, 1500, d)
    x = (x + params['pos_emb']).astype(x.dtype)

    use_flash = _use_flash_attention()

    def block(carry, layer_params):
        h = carry
        q_in = layer_norm(h, layer_params['attn_ln']['g'],
                          layer_params['attn_ln']['b'])
        if use_flash:
            attn_out = _flash_self_attention(layer_params['attn'], q_in, n_head)
        else:
            attn_out, _, _ = _mha(layer_params['attn'], q_in, None, n_head)
        h = h + attn_out
        h = h + _mlp(layer_params['mlp'],
                     layer_norm(h, layer_params['mlp_ln']['g'],
                                layer_params['mlp_ln']['b']))
        return h, None

    x, _ = jax.lax.scan(block, x, params['blocks'])
    return layer_norm(x, params['ln_post']['g'], params['ln_post']['b'])


# -- decoder ---------------------------------------------------------------------------------

def precompute_cross_kv(params: Params, xa: jnp.ndarray,
                        quantize=False) -> Params:
    """Project encoder output into per-layer cross-attention K/V once.

    ``quantize=True``/``8`` stores K/V as int8 with per-position scales
    (quantization.py): the cross-KV stream is the single largest HBM read of
    every decode step ((L, B, 1500, d) per token), so int8 halves it vs bf16;
    the dequant multiply fuses into the attention matmuls. ``4`` snaps to
    the same int4 grid the fused kernel's packed tiles use, stored unpacked
    (this unfused path trades no bandwidth — it exists for debugging and
    grid-equivalence tests).
    """
    bits = 0 if not quantize else (8 if quantize is True else int(quantize))

    def per_layer(layer_params, _):
        k = linear(xa, layer_params['cross_attn']['k']['w'])
        v = linear(xa, layer_params['cross_attn']['v']['w'],
                   layer_params['cross_attn']['v']['b'])
        if bits:
            from .quantization import quantize_tensor
            k = quantize_tensor(k, reduce_axis=-1, compute_dtype=xa.dtype,
                                bits=bits)
            v = quantize_tensor(v, reduce_axis=-1, compute_dtype=xa.dtype,
                                bits=bits)
        return _, (k, v)

    _, (k, v) = jax.lax.scan(lambda c, p: per_layer(p, c), None, params['blocks'])
    return {'k': k, 'v': v}  # (n_layers, batch, 1500, d)


def fuse_self_qkv(blocks: Params) -> Params:
    """Return decoder blocks with the self-attention q/k/v projections
    concatenated into one ``qkv`` leaf (w (L, d, 3d); b (L, 3d) — k has no
    bias, its slot is zeros).

    One (d, 3d) matmul replaces three (d, d) launches in the per-token
    decode step; at 32 layers that removes 64 kernel dispatches per sampled
    token. Built once per decode call (a ~0.4 ms concat) and injected as an
    extra scanned leaf, so the stored checkpoint layout never changes.
    QuantizedArray leaves concatenate exactly (per-output-channel scales
    concatenate along the same axis)."""
    attn = blocks['attn']
    q_w, k_w, v_w = attn['q']['w'], attn['k']['w'], attn['v']['w']
    if hasattr(q_w, 'q'):
        from .quantization import QuantizedArray
        w = QuantizedArray(
            jnp.concatenate([q_w.q, k_w.q, v_w.q], axis=-1),
            jnp.concatenate([q_w.scale, k_w.scale, v_w.scale], axis=-1),
            compute_dtype=q_w.compute_dtype)
    else:
        w = jnp.concatenate([q_w, k_w, v_w], axis=-1)
    b = jnp.concatenate([attn['q']['b'], jnp.zeros_like(attn['q']['b']),
                         attn['v']['b']], axis=-1)
    out = dict(blocks)
    out['qkv'] = {'w': w, 'b': b}
    return out


@partial(jax.jit, static_argnames=('quantize',))
def precompute_cross_kv_t(params: Params, xa: jnp.ndarray,
                          quantize=False) -> Params:
    """Cross-attention K/V in the TRANSPOSED layout the fused decode kernel
    reads (ops/cross_attn.py): kvT (n_layers, batch, 2, d, S_pad) stacked
    K^T/V^T + per-position scales sc (n_layers, batch, 2, 1, S_pad) + the
    real key length s. S pads up to the kernel's 512-lane chunk; the
    kernel masks positions >= s with an in-kernel -inf bias.

    ``quantize``: False/0 keeps float; True/8 stores int8 with per-position
    scales (amax/127 over d); 4 stores int4 on the [-7, 7] grid, packed two
    dims per int8 byte — dim r in the LOW nibble of packed row r, dim
    r + d/2 in its HIGH nibble (split-half, so the kernel unpacks with one
    concatenate instead of an interleave) — kvT (n_layers, batch, 2, d/2,
    S_pad). int4 halves the dominant per-step HBM stream again vs int8 at a
    coarser grid (15 levels per position); opt-in, never the auto default.
    """
    from ...ops.cross_attn import _S_CHUNK

    bits = 0 if not quantize else (8 if quantize is True else int(quantize))
    s = xa.shape[-2]
    s_pad = (s + _S_CHUNK - 1) // _S_CHUNK * _S_CHUNK

    def prep(t):
        # (batch, s, d) -> int8/float (batch, d, s_pad) + scales (batch, 1, s_pad)
        if bits:
            qmax = float(2 ** (bits - 1) - 1)
            amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1,
                           keepdims=True)
            sc = jnp.where(amax > 0, amax / qmax, 1.0)
            t = jnp.clip(jnp.round(t.astype(jnp.float32) / sc), -qmax,
                         qmax).astype(jnp.int8)
            sc = sc[..., 0]
        else:
            sc = jnp.ones(t.shape[:-1], jnp.float32)
        tt = jnp.pad(t.transpose(0, 2, 1), ((0, 0), (0, 0), (0, s_pad - s)))
        if bits == 4:
            d = tt.shape[1]
            lo, hi = tt[:, :d // 2], tt[:, d // 2:]
            tt = jnp.left_shift(hi, 4) | (lo & jnp.int8(0xF))
        sc = jnp.pad(sc, ((0, 0), (0, s_pad - s)),
                     constant_values=1.0)[:, None, :]
        return tt, sc

    def per_layer(_, layer_params):
        k = linear(xa, layer_params['cross_attn']['k']['w'])
        v = linear(xa, layer_params['cross_attn']['v']['w'],
                   layer_params['cross_attn']['v']['b'])
        kt, ks = prep(k)
        vt, vs = prep(v)
        return _, (kt, ks, vt, vs)

    _, (kt, ks, vt, vs) = jax.lax.scan(per_layer, None, params['blocks'])
    # Packed int4 tiles ride a DISTINCT key so the packing is part of the
    # pytree structure (trace-time static) — consumers dispatch on the key
    # instead of inferring nibble-packing from tile shapes, which would
    # silently misdecode any future layout whose K/V head dim legitimately
    # differs from the query dim.
    return {'kvT4' if bits == 4 else 'kvT': jnp.stack([kt, vt], axis=2),
            'sc': jnp.stack([ks, vs], axis=2),
            's': jnp.int32(s)}


@partial(jax.jit, static_argnames=('n_head', 'capture_qk'))
def decoder_apply(params: Params, tokens: jnp.ndarray, xa: jnp.ndarray,
                  n_head: int, capture_qk: bool = False,
                  capture_index: Optional[jnp.ndarray] = None):
    """Full (teacher-forced) decoder pass.

    tokens: (batch, n_tok) int32; xa: (batch, 1500, d).
    Returns (logits (batch, n_tok, n_vocab),
             cross_qk (n_layers, batch, n_head, n_tok, 1500) bf16 or None).

    ``capture_index`` (n_layers, max_heads) int32 restricts the capture to
    chosen heads per layer (build with
    :func:`timing.build_head_capture_table`); the returned cross_qk is then
    (n_layers, batch, max_heads, n_tok, 1500). With the canonical alignment
    heads (~10 of large-v3's 640) this shrinks the capture HBM footprint
    ~60x, which is what keeps the batched word-timing pass on-chip at large
    batch sizes. Padding slots duplicate head 0 of their layer — callers
    select only valid (layer, slot) entries.
    """
    b, n_tok = tokens.shape
    x = params['token_emb'][tokens] + params['pos_emb'][:n_tok]
    x = x.astype(params['token_emb'].dtype)
    causal = jnp.triu(jnp.full((n_tok, n_tok), -jnp.inf, jnp.float32), k=1)
    # Flash cross-attention skips materializing the (B, H, T, 1500) logits
    # of heads nobody reads; it applies whenever the capture is selective
    # (or absent) — the dynamic/'new' aligner modes need every head's QK
    # and keep the materializing path.
    use_flash = _use_flash_attention() and (not capture_qk
                                            or capture_index is not None)

    def block(carry, layer_inputs):
        layer_params, head_idx = layer_inputs
        h = carry
        attn_out, _, _ = _mha(
            layer_params['attn'],
            layer_norm(h, layer_params['attn_ln']['g'], layer_params['attn_ln']['b']),
            None, n_head, mask=causal)
        h = h + attn_out
        ca_in = layer_norm(h, layer_params['cross_attn_ln']['g'],
                           layer_params['cross_attn_ln']['b'])
        if use_flash:
            cross_out, qk = _flash_cross_attention(
                layer_params['cross_attn'], ca_in, xa, n_head,
                capture_heads=head_idx if capture_qk else None)
        else:
            cross_out, qk, _ = _mha(layer_params['cross_attn'], ca_in,
                                    xa, n_head, return_qk=capture_qk)
        h = h + cross_out
        h = h + _mlp(layer_params['mlp'],
                     layer_norm(h, layer_params['mlp_ln']['g'],
                                layer_params['mlp_ln']['b']))
        if qk is not None:
            if head_idx is not None and not use_flash:
                # flash already captured only the selected heads
                qk = qk[:, head_idx]  # (B, max_heads, T, 1500)
            # bf16 capture halves the QK footprint — the head-selection/
            # softmax math downstream runs in f32 anyway.
            qk = qk.astype(jnp.bfloat16)
        return h, qk

    xs = (params['blocks'], capture_index)
    x, cross_qks = jax.lax.scan(block, x, xs)
    x = layer_norm(x, params['ln']['g'], params['ln']['b'])
    logits = _vocab_logits(x, params['token_emb'])
    return logits, cross_qks


def _shared_kv_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         n_head: int, g: int) -> jnp.ndarray:
    """Cross-attention where each K/V batch row serves ``g`` query rows.

    q: (rows, 1, d) with rows = b * g (query row i belongs to KV row i // g);
    k/v: (b, S, d). Returns (rows, 1, d). Used by beam search / best_of:
    beams of the same window share the window's K/V, so the K/V stream is
    read once per group instead of once per beam.
    """
    rows, _, d = q.shape
    b = rows // g
    s = k.shape[1]
    d_head = d // n_head
    scale = d_head ** -0.25
    qh = (q.reshape(b, g, n_head, d_head).transpose(0, 2, 1, 3)
          * scale).astype(jnp.float32)                     # (b, H, g, dh)
    kh = (k.reshape(b, s, n_head, d_head).transpose(0, 2, 1, 3)
          * scale).astype(jnp.float32)                     # (b, H, S, dh)
    vh = v.reshape(b, s, n_head, d_head).transpose(0, 2, 1, 3)
    logits = jnp.einsum('bhgd,bhsd->bhgs', qh, kh,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhgs,bhsd->bhgd', w, vh,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(rows, 1, d)


@partial(jax.jit, static_argnames=('n_head', 'q_per_kv', 'ctx_live',
                                   'return_hidden'))
def decoder_step(params: Params, tokens: jnp.ndarray, pos: jnp.ndarray,
                 cross_kv: Params, kv_cache: Params, n_head: int,
                 q_per_kv: int = 1, anc: jnp.ndarray = None,
                 ctx_live: int = None, return_hidden: bool = False):
    """One incremental decode step with a fixed-size KV cache.

    tokens: (batch, 1) int32 — tokens at position ``pos``.
    pos: scalar int32 — current position (same across batch).
    cross_kv: {'k','v'} (n_layers, batch // q_per_kv, 1500, d) precomputed.
    kv_cache: {'k','v'} (n_layers, batch, n_text_ctx, d).
    q_per_kv: consecutive batch rows sharing one cross-KV row (beam
        search / best_of — the encoder features are identical across a
        window's beams, so K/V is stored and streamed once per window).
    anc: (batch, n_ctx) int32 beam-ancestry table or None — row r's
        self-K/V at position j lives in group row ``anc[r, j]`` (local
        index in [0, q_per_kv)). The beam loop carries and gathers THIS
        table on reshuffle instead of re-gathering the cache itself
        (decoding.py:_beam_loop); ``anc[:, pos]`` must be each row's own
        local index (the current token's K/V is written in place here).
    ctx_live: static bound on pos + 1 — only the first ctx_live cache
        positions are read by self-attention (the sampling loops bucket
        the cache stream by realized length). None -> n_ctx.
    Returns (logits (batch, n_vocab), updated kv_cache).
    """
    x = params['token_emb'][tokens] + jax.lax.dynamic_slice_in_dim(
        params['pos_emb'], pos, 1, axis=0)
    x = x.astype(params['token_emb'].dtype)
    quant_self = 'ks' in kv_cache  # int8 row cache + per-position scales
    n_layers, batch, n_ctx, d = kv_cache['k'].shape
    if ctx_live is None:
        ctx_live = n_ctx
    ctx_live = min(n_ctx, max(128, int(ctx_live)))
    # Mask future positions: position j is valid iff j <= pos.
    valid = (jnp.arange(ctx_live)[None, :] <= pos)
    self_mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)[None, :]

    # The KV cache rides the scan CARRY (not xs/ys): each layer writes only
    # its (1, batch, 1, d) slot via dynamic_update_slice, which XLA performs
    # in place on the donated loop state. Threading the cache through scan
    # outputs instead would rewrite (and double-buffer) the entire
    # (n_layers, batch, n_ctx, d) stack every token step — that copy traffic
    # dominated the step cost and OOM'd large batches.
    fused_cross = 'kvT' in cross_kv or 'kvT4' in cross_kv
    self_fa = _self_fa_mode()
    if self_fa != 'off' and anc is not None and q_per_kv > 1:
        # the beam kernel's grid step holds the WHOLE group's K+V slabs
        # (double-buffered) in VMEM; past the budget Mosaic fails the
        # launch at runtime — fall back to the XLA ancestry-gather path
        # (bf16 self-KV at beam>=5, or long-prompt 448-slot caches)
        itemsize = jnp.dtype(kv_cache['k'].dtype).itemsize
        blk = q_per_kv * ctx_live * d * itemsize * 2 * 2
        if blk > 12 * 2 ** 20:
            self_fa = 'off'

    def block(carry, scanned):
        h, kc, vc, ksc, vsc = carry
        layer_params, layer_cross_kv, layer_idx = scanned
        q_in = layer_norm(h, layer_params['attn_ln']['g'], layer_params['attn_ln']['b'])
        if 'qkv' in layer_params:   # fused projection (fuse_self_qkv)
            qkv = linear(q_in, layer_params['qkv']['w'],
                         layer_params['qkv']['b'])
            q_proj, new_k, new_v = jnp.split(qkv, 3, axis=-1)
        else:
            q_proj = linear(q_in, layer_params['attn']['q']['w'],
                            layer_params['attn']['q']['b'])
            new_k = linear(q_in, layer_params['attn']['k']['w'])
            new_v = linear(q_in, layer_params['attn']['v']['w'],
                           layer_params['attn']['v']['b'])
        if quant_self:
            # int8 row cache: quantize this position's K/V rows (contiguous
            # row write — the transposed layout's strided column writes
            # were what killed the earlier int8 self-KV attempt)
            def upd(cache, scales, t):
                t32 = t.astype(jnp.float32)               # (B, 1, d)
                amax = jnp.max(jnp.abs(t32), axis=-1, keepdims=True)
                sc = jnp.where(amax > 0, amax / 127.0, 1.0)
                qt = jnp.clip(jnp.round(t32 / sc), -127, 127).astype(jnp.int8)
                cache = jax.lax.dynamic_update_slice(
                    cache, qt[None], (layer_idx, 0, pos, 0))
                scales = jax.lax.dynamic_update_slice(
                    scales, sc.transpose(0, 2, 1)[None],
                    (layer_idx, 0, 0, pos))
                return cache, scales

            kc, ksc = upd(kc, ksc, new_k)
            vc, vsc = upd(vc, vsc, new_v)
        else:
            kc = jax.lax.dynamic_update_slice(kc, new_k[None].astype(kc.dtype),
                                              (layer_idx, 0, pos, 0))
            vc = jax.lax.dynamic_update_slice(vc, new_v[None].astype(vc.dtype),
                                              (layer_idx, 0, pos, 0))
        if self_fa != 'off':
            # Fused kernel: the layer index steers the BlockSpec via
            # scalar prefetch, so the layer's cache slab streams
            # HBM -> VMEM once — no dynamic_slice copy, no HBM logits.
            from ...ops.self_attn import self_attn_decode
            q = (q_proj[:, 0, :].astype(jnp.float32)
                 * ((d // n_head) ** -0.5))
            ctx = self_attn_decode(q, kc, vc, layer_idx, pos, n_head,
                                   ks=ksc, vs=vsc, anc=anc,
                                   q_per_kv=q_per_kv, ctx_live=ctx_live,
                                   interpret=self_fa == 'interpret')
            attn_out = linear(ctx[:, None, :].astype(h.dtype),
                              layer_params['attn']['out']['w'],
                              layer_params['attn']['out']['b'])
        else:
            def layer_slab(cache, scales):
                slab = jax.lax.dynamic_slice(
                    cache, (layer_idx, 0, 0, 0), (1, batch, ctx_live, d))[0]
                if scales is None:
                    return slab
                sc = jax.lax.dynamic_slice(
                    scales, (layer_idx, 0, 0, 0), (1, batch, 1, ctx_live))[0]
                return slab.astype(jnp.float32) * sc.transpose(0, 2, 1)

            k_cache = layer_slab(kc, ksc)
            v_cache = layer_slab(vc, vsc)
            if anc is not None and q_per_kv > 1:
                # XLA fallback for the beam ancestry table: gather each
                # row's effective K/V from its group by per-position
                # ancestor (materializes one layer's slab — test path).
                def by_ancestor(slab):
                    grp = slab.reshape(batch // q_per_kv, q_per_kv,
                                       ctx_live, -1)
                    idx = anc[:, :ctx_live].reshape(
                        batch // q_per_kv, q_per_kv, ctx_live)[..., None]
                    return jnp.take_along_axis(grp, idx, axis=1).reshape(
                        batch, ctx_live, -1)

                k_cache = by_ancestor(k_cache)
                v_cache = by_ancestor(v_cache)
            attn_out, _, _ = _mha(layer_params['attn'], q_in, None, n_head,
                                  mask=self_mask,
                                  kv_override=(k_cache, v_cache),
                                  q_override=q_proj)
        h = h + attn_out
        ca_in = layer_norm(h, layer_params['cross_attn_ln']['g'],
                           layer_params['cross_attn_ln']['b'])
        if fused_cross:
            # Fused Pallas kernel (ops/cross_attn.py): the int8 K/V tiles
            # stream HBM -> VMEM once and dequantize in registers — the
            # unfused path re-materializes bf16 K/V + logits in HBM. The
            # FULL layer stack is the operand (closed over, loop-invariant);
            # layer_idx steers the kernel's BlockSpec, so no per-layer
            # scan-xs slice copy of the 60+ MB tiles exists.
            from ...ops.cross_attn import cross_attn_decode
            ca = layer_params['cross_attn']
            q = linear(ca_in, ca['q']['w'], ca['q']['b'])[:, 0, :]
            q = q.astype(jnp.float32) * ((d // n_head) ** -0.5)
            packed4 = 'kvT4' in cross_kv
            ctx = cross_attn_decode(
                q, cross_kv['kvT4'] if packed4 else cross_kv['kvT'],
                cross_kv['sc'], n_head, s=cross_kv['s'], q_per_kv=q_per_kv,
                layer_idx=layer_idx, bits=4 if packed4 else 8)
            cross_out = linear(ctx[:, None, :].astype(h.dtype),
                               ca['out']['w'], ca['out']['b'])
        elif q_per_kv > 1:
            ca = layer_params['cross_attn']
            ck, cv = layer_cross_kv
            if hasattr(ck, 'dequantize'):
                ck = ck.dequantize()
            if hasattr(cv, 'dequantize'):
                cv = cv.dequantize()
            q = linear(ca_in, ca['q']['w'], ca['q']['b'])
            ctx = _shared_kv_attention(q, ck, cv, n_head, q_per_kv)
            cross_out = linear(ctx, ca['out']['w'], ca['out']['b'])
        else:
            cross_out, _, _ = _mha(layer_params['cross_attn'], ca_in,
                                   None, n_head, kv_override=layer_cross_kv)
        h = h + cross_out
        h = h + _mlp(layer_params['mlp'],
                     layer_norm(h, layer_params['mlp_ln']['g'],
                                layer_params['mlp_ln']['b']))
        return (h, kc, vc, ksc, vsc), None

    # Fused cross-attention closes over the full stacks (loop-invariant);
    # only the unfused paths ride per-layer slices through scan xs.
    cross_xs = (() if fused_cross
                else (cross_kv['k'], cross_kv['v']))
    carry0 = (x, kv_cache['k'], kv_cache['v'],
              kv_cache.get('ks'), kv_cache.get('vs'))
    (x, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
        block, carry0, (params['blocks'], cross_xs, jnp.arange(n_layers)))
    x = layer_norm(x, params['ln']['g'], params['ln']['b'])
    new_cache = ({'k': new_k, 'ks': new_ks, 'v': new_v, 'vs': new_vs}
                 if quant_self else {'k': new_k, 'v': new_v})
    if return_hidden:
        # the fused logit epilogue (ops/logit_epilogue.py) consumes the
        # post-LN hidden state directly — the (B, V) logits never exist
        return x[:, 0], new_cache
    return _vocab_logits(x[:, 0], params['token_emb']), new_cache


def _quantize_cache_entry(t: jnp.ndarray, n_ctx: int):
    """(B, T, d) -> row-major int8 (B, n_ctx, d) + per-position scales
    (B, 1, n_ctx) for the int8 self-attention cache."""
    t32 = t.astype(jnp.float32)
    amax = jnp.max(jnp.abs(t32), axis=-1, keepdims=True)      # (B, T, 1)
    sc = jnp.where(amax > 0, amax / 127.0, 1.0)
    qt = jnp.clip(jnp.round(t32 / sc), -127, 127).astype(jnp.int8)
    pad = n_ctx - t.shape[1]
    qt = jnp.pad(qt, ((0, 0), (0, pad), (0, 0)))
    sc = jnp.pad(sc[..., 0], ((0, 0), (0, pad)),
                 constant_values=1.0)[:, None, :]
    return qt, sc


@partial(jax.jit, static_argnames=('n_head', 'n_text_ctx', 'int8_cache'))
def decoder_prefill(params: Params, tokens: jnp.ndarray, xa: jnp.ndarray,
                    n_head: int, n_text_ctx: int, int8_cache: bool = False):
    """Teacher-forced forward over the initial tokens that also fills the
    fixed-size KV cache (positions [0, n_tok)) for subsequent decoder_step.

    Returns (logits (batch, n_tok, n_vocab), kv_cache dict).
    ``int8_cache=True`` emits the row-major int8 cache layout
    ({'k','ks','v','vs'}: int8 (L, B, n_ctx, d) + per-position scales
    (L, B, 1, n_ctx)) that decoder_step's fused self-attention kernel
    dequantizes in registers — the per-step self-KV stream halves vs bf16,
    the same trade the int8 cross-KV cache already makes.
    """
    b, n_tok = tokens.shape
    x = params['token_emb'][tokens] + params['pos_emb'][:n_tok]
    x = x.astype(params['token_emb'].dtype)
    causal = jnp.triu(jnp.full((n_tok, n_tok), -jnp.inf, jnp.float32), k=1)
    d = params['token_emb'].shape[1]

    def block(carry, layer_params):
        h = carry
        q_in = layer_norm(h, layer_params['attn_ln']['g'], layer_params['attn_ln']['b'])
        k = linear(q_in, layer_params['attn']['k']['w'])
        v = linear(q_in, layer_params['attn']['v']['w'], layer_params['attn']['v']['b'])
        attn_out, _, _ = _mha(layer_params['attn'], q_in, None, n_head,
                              mask=causal, kv_override=(k, v))
        h = h + attn_out
        cross_out, _, _ = _mha(
            layer_params['cross_attn'],
            layer_norm(h, layer_params['cross_attn_ln']['g'],
                       layer_params['cross_attn_ln']['b']),
            xa, n_head)
        h = h + cross_out
        h = h + _mlp(layer_params['mlp'],
                     layer_norm(h, layer_params['mlp_ln']['g'],
                                layer_params['mlp_ln']['b']))
        if int8_cache:
            kq, ksc = _quantize_cache_entry(k, n_text_ctx)
            vq, vsc = _quantize_cache_entry(v, n_text_ctx)
            return h, (kq, ksc, vq, vsc)
        pad = n_text_ctx - n_tok
        k_full = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v_full = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        return h, (k_full, v_full)

    x, cache_ys = jax.lax.scan(block, x, params['blocks'])
    x = layer_norm(x, params['ln']['g'], params['ln']['b'])
    logits = _vocab_logits(x, params['token_emb'])
    if int8_cache:
        kq, ksc, vq, vsc = cache_ys
        return logits, {'k': kq, 'ks': ksc, 'v': vq, 'vs': vsc}
    k_cache, v_cache = cache_ys
    return logits, {'k': k_cache, 'v': v_cache}


def init_kv_cache(dims: ModelDimensions, batch: int, dtype=jnp.float32) -> Params:
    shape = (dims.n_text_layer, batch, dims.n_text_ctx, dims.n_text_state)
    return {'k': jnp.zeros(shape, dtype), 'v': jnp.zeros(shape, dtype)}


# -- parameter initialization (synthetic checkpoints for tests/bench) ----------------------

def _init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    w = jax.random.normal(k1, (d_in, d_out), dtype) * (d_in ** -0.5)
    out = {'w': w}
    if bias:
        out['b'] = jnp.zeros((d_out,), dtype)
    return out


def _init_attn(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {
        'q': _init_linear(ks[0], d, d, dtype=dtype),
        'k': _init_linear(ks[1], d, d, bias=False, dtype=dtype),
        'v': _init_linear(ks[2], d, d, dtype=dtype),
        'out': _init_linear(ks[3], d, d, dtype=dtype),
    }


def _init_ln(d, dtype):
    return {'g': jnp.ones((d,), dtype), 'b': jnp.zeros((d,), dtype)}


def _stack_layers(layer_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)


def init_params(dims: ModelDimensions, seed: int = 0, dtype=jnp.float32) -> Params:
    """Random-weight model (for tests and compute benchmarks: the FLOP cost
    is identical to trained weights)."""
    key = jax.random.PRNGKey(seed)
    keys = jax.random.split(key, 16)
    d_a, d_t = dims.n_audio_state, dims.n_text_state

    def enc_block(k):
        k1, k2 = jax.random.split(k)
        return {
            'attn_ln': _init_ln(d_a, dtype),
            'attn': _init_attn(k1, d_a, dtype),
            'mlp_ln': _init_ln(d_a, dtype),
            'mlp': {'fc1': _init_linear(k2, d_a, 4 * d_a, dtype=dtype),
                    'fc2': _init_linear(k2, 4 * d_a, d_a, dtype=dtype)},
        }

    def dec_block(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            'attn_ln': _init_ln(d_t, dtype),
            'attn': _init_attn(k1, d_t, dtype),
            'cross_attn_ln': _init_ln(d_t, dtype),
            'cross_attn': _init_attn(k2, d_t, dtype),
            'mlp_ln': _init_ln(d_t, dtype),
            'mlp': {'fc1': _init_linear(k3, d_t, 4 * d_t, dtype=dtype),
                    'fc2': _init_linear(k3, 4 * d_t, d_t, dtype=dtype)},
        }

    enc_keys = jax.random.split(keys[0], dims.n_audio_layer)
    dec_keys = jax.random.split(keys[1], dims.n_text_layer)
    encoder = {
        'conv1': {'w': jax.random.normal(keys[2], (3, dims.n_mels, d_a), dtype) * 0.02,
                  'b': jnp.zeros((d_a,), dtype)},
        'conv2': {'w': jax.random.normal(keys[3], (3, d_a, d_a), dtype) * 0.02,
                  'b': jnp.zeros((d_a,), dtype)},
        'pos_emb': jnp.asarray(sinusoids(dims.n_audio_ctx, d_a), dtype),
        'blocks': _stack_layers([enc_block(k) for k in enc_keys]),
        'ln_post': _init_ln(d_a, dtype),
    }
    decoder = {
        'token_emb': jax.random.normal(keys[4], (dims.n_vocab, d_t), dtype) * 0.02,
        'pos_emb': jax.random.normal(keys[5], (dims.n_text_ctx, d_t), dtype) * 0.01,
        'blocks': _stack_layers([dec_block(k) for k in dec_keys]),
        'ln': _init_ln(d_t, dtype),
    }
    return {'encoder': encoder, 'decoder': decoder}


def tiny_test_dims(n_vocab: int = 1864) -> ModelDimensions:
    # 1864 = 256 byte tokens + 1608 specials (2 + 99 langs + 6 + 1501 timestamps),
    # i.e. the synthetic tokenizer's layout.
    """A miniature config for fast offline tests (not a real checkpoint size)."""
    return ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=n_vocab, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2)
