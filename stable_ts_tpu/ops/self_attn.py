"""Fused self-attention decode kernel (Pallas, TPU).

The decode step's self-attention is the single most overhead-laden phase of
the sampler (probe_step.py, large-v3 b16: 5.98 ms of a 12.4 ms step against
a ~1.3 ms roofline). The XLA path pays for it three times per layer:
``dynamic_slice`` materializes the layer's K and V cache slabs out of the
scanned (L, B, n_ctx, d) carry (read + write), then the attention einsums
re-read the copies, then the (B, H, 1, n_ctx) logits round-trip HBM. This
kernel reads each layer's cache slab from HBM exactly once:

    K/V slab --DMA--> VMEM --block-diagonal MXU QK^T
    -> masked softmax -> ·V accumulate            (nothing back to HBM)

Measured on the v5e (probe_step.py `fa` variant): the full decode step
dropped 12.48 -> 8.26 ms at large-v3 b16 — self-attention itself ~3.6x.

Design notes:

- **The full (L, B, n_ctx, d) cache is the operand.** The layer index
  arrives as a scalar-prefetch argument (``pltpu.PrefetchScalarGridSpec``)
  and steers the BlockSpec index map, so the kernel DMAs the right layer's
  slab directly — no host-side ``dynamic_slice`` copy ever exists. The
  cache keeps its natural row-major layout: the per-step cache update
  stays a cheap contiguous ``dynamic_update_slice`` row write (the earlier
  transposed-int8 variant died on strided column writes — BASELINE.md).
- **int8 cache rows ride the same kernel.** Per-position dequant scales
  ``(1, n_ctx)`` multiply the (n_head, n_ctx) logit/weight rows — they
  never touch the (n_ctx, d) tiles, and the MXU consumes the int8 rows
  directly (no dequantized copy exists anywhere), halving the dominant
  cache stream. The bf16 path passes all-ones scales: the two extra
  (1, n_ctx) vector DMAs are noise next to the slab stream.
- **Block-diagonal MXU contraction**, same trick as ops/cross_attn.py: a
  batch row's query embeds into an (n_head, d) matrix that is zero off
  each head's d_head block, turning per-head QK^T and softmax·V into one
  MXU matmul each.
- **Several batch rows per grid step** (``rows_per_step``) amortize the
  per-grid-step sequencing overhead that made a one-row-per-step variant
  only break even.
- The causal mask is built in-kernel from the prefetched ``pos`` scalar
  (position j participates iff j <= pos) — kernels must not capture array
  constants.
- **Beam search attends through an ancestry table instead of a cache
  gather.** The beam reshuffle used to re-gather the whole (L, rows,
  n_ctx, d) cache along the batch axis every step (~3.4 GB read+write at
  large-v3 beam 5 x 16 windows — the biggest line item of the beam step).
  Instead the cache rows stay physically fixed and a (rows, n_ctx) int32
  ``anc`` table records, per position, WHICH beam of the group wrote the
  K/V this row should attend to. The kernel loads the whole group's g
  slabs (they share one grid step), computes each beam's logits against
  every sibling's keys (g extra MXU dots — FLOPs are free, the kernel is
  bandwidth-bound), and one-hot-selects by ancestor. Reshuffle then costs
  a (rows, n_ctx) int32 gather (~80 KB) instead of gigabytes.

Reference context: stable-ts inherits whisper's torch MHA with its hook
machinery (timing.py:50-57); there is no decode-step kernel to mirror —
this is TPU-native design, not translation.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['self_attn_decode']


def _kernel(scalars_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref, out_ref, *,
            n_head: int, rows: int, g: int):
    """``g`` batch rows share one block-diagonal MXU dot.

    A one-row-per-dot variant issued 2 tiny (n_head, d) x (d, n_ctx)
    matmuls per row — 1024 serialized MXU ops per token step at large-v3
    b16, measured ~1.2 us each (instruction latency, not bandwidth:
    probe_phase.py put the kernel ~6x over its cache-stream floor). Here
    the g rows' query head-blocks stack into one (g*n_head, d) matrix and
    their K/V slabs flatten along the key axis, so QK^T and the weighted
    sum are ONE dot each; a block-diagonal bias (query row attends only
    its own slab's columns) keeps the math exactly the per-row softmax.
    The g-fold extra FLOPs are free next to the instruction-issue save.
    """
    d = q_ref.shape[-1]
    n_ctx = kc_ref.shape[2]
    d_head = d // n_head
    i = pl.program_id(0)
    pos = scalars_ref[1]
    gh = g * n_head
    gc = g * n_ctx

    # row r*H+h of the stacked query block selects head h's d_head columns
    col_head = jax.lax.broadcasted_iota(jnp.int32, (gh, d), 1) // d_head
    row_head = jax.lax.broadcasted_iota(jnp.int32, (gh, d), 0) % n_head
    hmask = (col_head == row_head).astype(jnp.float32)          # (g*H, d)
    # scatter the g query rows onto their n_head-row blocks
    row_q = jax.lax.broadcasted_iota(jnp.int32, (gh, g), 0) // n_head
    col_q = jax.lax.broadcasted_iota(jnp.int32, (gh, g), 1)
    expand = (row_q == col_q).astype(jnp.float32)               # (g*H, g)
    # causal + block-diagonal bias over the flattened key axis
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (gh, gc), 1) % n_ctx
    key_row = jax.lax.broadcasted_iota(jnp.int32, (gh, gc), 1) // n_ctx
    q_row = jax.lax.broadcasted_iota(jnp.int32, (gh, gc), 0) // n_head
    bias = jnp.where((key_pos <= pos) & (key_row == q_row),
                     0.0, -jnp.inf).astype(jnp.float32)

    cache_dtype = kc_ref.dtype
    op_dtype = jnp.bfloat16 if cache_dtype == jnp.int8 else cache_dtype
    for base in range(0, rows, g):
        qrows = q_ref[pl.ds(i * rows + base, g), :].astype(jnp.float32)
        qblk = (hmask * jax.lax.dot_general(
            expand, qrows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(op_dtype)  # (g*H, d)
        k = kc_ref[0, pl.ds(base, g)].reshape(gc, d)
        lg = jax.lax.dot_general(qblk, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        lg = lg * ks_ref[0, pl.ds(base, g)].reshape(1, gc) + bias  # (g*H, gc)
        m = jnp.max(lg, axis=1, keepdims=True)
        w = jnp.exp(lg - m)
        l = jnp.sum(w, axis=1, keepdims=True)
        v = vc_ref[0, pl.ds(base, g)].reshape(gc, d)
        o2 = jax.lax.dot_general(
            (w * vs_ref[0, pl.ds(base, g)].reshape(1, gc)).astype(op_dtype),
            v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                    # (g*H, d)
        # fold each row's n_head head-rows back onto its d columns
        o = jax.lax.dot_general(expand, o2 * hmask, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        l_d = jax.lax.dot_general(expand, hmask * l, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out_ref[pl.ds(i * rows + base, g), :] = o / l_d


def _kernel_beam(scalars_ref, q_ref, anc_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                 out_ref, *, n_head: int, g: int, g_pad: int, gps: int):
    """One grid step = ``gps`` window groups of ``g`` beams each.

    kc/vc blocks hold ALL the step's beam slabs; beam r's key at position
    j is row ``anc[r, j]`` of its group, selected by one-hot masks folded
    into the dequant scales (one-hot x scale rides the same (1, n_ctx)
    vector multiply the int8 path already does, so selection is free on
    the VPU). All g beams of a group batch into ONE (g*n_head, d) query
    block per sibling dot — g MXU matmuls per contraction instead of the
    earlier g*g per-beam dots of sublane-starved M = n_head (same FLOPs,
    5x fewer instructions at beam 5, full-M tiles). A flattened-key
    single-dot variant (one (g*H, g*n_ctx) dot + additive ancestor mask)
    measured ~9% SLOWER end-to-end on the v5e — the per-sibling
    accumulation pipeline wins; keep this form.
    """
    d = q_ref.shape[-1]
    n_ctx = kc_ref.shape[2]
    d_head = d // n_head
    pos = scalars_ref[1]
    rows_blk = g * n_head

    col_head = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, d), 1) // d_head
    row_head = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, d), 0) % n_head
    hmask = (col_head == row_head).astype(jnp.float32)           # (g*H, d)
    # scatter each beam's query row onto its n_head-row block
    row_beam = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, g_pad), 0) // n_head
    col_q = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, g_pad), 1)
    expand = (row_beam == col_q).astype(jnp.float32)             # (g*H, g_pad)
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (rows_blk, n_ctx), 1)
    bias = jnp.where(key_pos <= pos, 0.0, -jnp.inf).astype(jnp.float32)

    cache_dtype = kc_ref.dtype
    op_dtype = jnp.bfloat16 if cache_dtype == jnp.int8 else cache_dtype
    for gp in range(gps):
        qrows = q_ref[0, pl.ds(gp * g_pad, g_pad), :].astype(jnp.float32)
        qblk = (hmask * jax.lax.dot_general(
            expand, qrows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)).astype(op_dtype)  # (g*H, d)
        # per-row ancestry, repeated over each beam's head block
        anc_g = anc_ref[0, pl.ds(gp * g, g), 0, :].astype(jnp.float32)
        anc_rows = jax.lax.dot_general(
            expand[:, :g], anc_g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (g*H, n_ctx)
        lg = bias
        for s in range(g):
            lg_s = jax.lax.dot_general(qblk, kc_ref[0, gp * g + s],
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            sel = (anc_rows == s).astype(jnp.float32)
            lg = lg + lg_s * (sel * ks_ref[0, gp * g + s])       # (g*H, n_ctx)
        m = jnp.max(lg, axis=1, keepdims=True)
        w = jnp.exp(lg - m)
        l = jnp.sum(w, axis=1, keepdims=True)
        o2 = jnp.zeros((rows_blk, d), jnp.float32)
        for s in range(g):
            sel = (anc_rows == s).astype(jnp.float32)
            o2 = o2 + jax.lax.dot_general(
                (w * (sel * vs_ref[0, gp * g + s])).astype(op_dtype),
                vc_ref[0, gp * g + s], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # (g*H, d)
        # fold each beam's n_head rows back onto its d columns
        o = jax.lax.dot_general(expand, o2 * hmask, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        l_d = jax.lax.dot_general(expand, hmask * l, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # padded beam rows (g..g_pad-1) have all-zero expand columns -> keep
        # them finite (the host slices them off) so debug-nans stays usable
        l_d = jnp.where(l_d == 0, 1.0, l_d)
        out_ref[0, pl.ds(gp * g_pad, g_pad), :] = o / l_d


def _beam_groups_per_step(n_groups: int, g: int, n_ctx: int, d: int,
                          itemsize: int) -> int:
    """Window groups per grid step: widest whose double-buffered K+V slab
    blocks stay inside the VMEM budget (fewer grid steps = less per-step
    sequencing overhead). ``STABLE_TS_TPU_BEAM_GPS`` overrides for
    experiments on hardware (values < 1 or non-divisors of the group
    count fall back to the auto choice)."""
    import os
    env = os.environ.get('STABLE_TS_TPU_BEAM_GPS')
    if env:
        try:
            val = int(env)
        except ValueError:
            val = 0
        if val >= 1 and n_groups % val == 0:
            return val
    for cand in (8, 4, 2):
        if (n_groups % cand == 0
                and cand * g * n_ctx * d * itemsize * 4 <= 12 * 2 ** 20):
            return cand
    return 1


@partial(jax.jit, static_argnames=('n_head', 'g', 'gps', 'ctx_blk',
                                   'interpret'))
def _call_beam(scalars, q, anc, kc, ks, vc, vs, n_head: int, g: int,
               gps: int, ctx_blk: int, interpret: bool):
    n_layers, b, n_ctx, d = kc.shape
    n_groups = b // g
    g_pad = (g + 7) // 8 * 8
    kernel = partial(_kernel_beam, n_head=n_head, g=g, g_pad=g_pad, gps=gps)
    # ctx_blk < n_ctx buckets the cache stream by realized length: the
    # BlockSpec covers only the first ctx_blk positions of each slab, so
    # the dead tail of the fixed-size cache never leaves HBM (the sampler
    # re-traces with a bigger bucket when pos outgrows it).
    slab = pl.BlockSpec((1, gps * g, ctx_blk, d), lambda i, s: (s[0], i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, gps * g, 1, ctx_blk), lambda i, s: (s[0], i, 0, 0),
                       memory_space=pltpu.VMEM)
    anc4 = anc.reshape(n_groups // gps, gps * g, 1, n_ctx)
    # beam layout: sublane-aligned (gps*g_pad, d) query/output blocks per
    # program (a dynamic-start (g, d) slice at stride g won't lower)
    qb = jnp.pad(q.reshape(n_groups, g, d), ((0, 0), (0, g_pad - g), (0, 0)))
    qb = qb.reshape(n_groups // gps, gps * g_pad, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups // gps,),
        in_specs=[
            pl.BlockSpec((1, gps * g_pad, d), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gps * g, 1, ctx_blk), lambda i, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            slab, vec, slab, vec,
        ],
        out_specs=pl.BlockSpec((1, gps * g_pad, d), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups // gps, gps * g_pad, d),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * g * d * ctx_blk,
            bytes_accessed=2 * b * d * ctx_blk * kc.dtype.itemsize + b * d * 4,
            transcendentals=b * n_head * ctx_blk,
        ),
    )(scalars, qb, anc4, kc, ks, vc, vs)
    return out.reshape(n_groups, g_pad, d)[:, :g].reshape(b, d)


@partial(jax.jit, static_argnames=('n_head', 'ctx_blk', 'interpret'))
def _call(scalars, q, kc, ks, vc, vs, n_head: int, ctx_blk: int,
          interpret: bool):
    n_layers, b, n_ctx, d = kc.shape
    # widest row block whose double-buffered K+V tiles stay well inside
    # VMEM: rows * ctx_blk * d * itemsize * 2(kv) * 2(buffers) <= ~12 MB
    # (ctx_blk < n_ctx buckets the cache stream by realized length AND
    # lets more rows share a grid step — fewer steps, less sequencing)
    rows = 1
    for cand in (16, 8, 4, 2):
        if (b % cand == 0
                and cand * ctx_blk * d * kc.dtype.itemsize * 4 <= 12 * 2 ** 20):
            rows = cand
            break
    # block-diagonal group: g*n_head query rows per MXU dot (full-M tiles)
    # at g^2 * n_ctx * n_head flops. Mosaic needs the dynamic (g, d) query
    # row loads sublane-aligned, so g must be a multiple of 8 (g=1 loads a
    # single row, which lowers specially) — g in {8, 1} only.
    g = 8 if rows % 8 == 0 else 1
    kernel = partial(_kernel, n_head=n_head, rows=rows, g=g)
    slab = pl.BlockSpec((1, rows, ctx_blk, d), lambda i, s: (s[0], i, 0, 0),
                        memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, rows, 1, ctx_blk), lambda i, s: (s[0], i, 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            slab, vec, slab, vec,
        ],
        out_specs=pl.BlockSpec((b, d), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_head * d * ctx_blk * g,
            bytes_accessed=2 * b * d * ctx_blk * kc.dtype.itemsize + b * d * 4,
            transcendentals=b * n_head * ctx_blk * g,
        ),
    )(scalars, q, kc, ks, vc, vs)


def self_attn_decode(q: jnp.ndarray, kc: jnp.ndarray, vc: jnp.ndarray,
                     layer_idx, pos, n_head: int,
                     ks: jnp.ndarray = None, vs: jnp.ndarray = None,
                     anc: jnp.ndarray = None, q_per_kv: int = 1,
                     ctx_live: int = None,
                     interpret: bool = False) -> jnp.ndarray:
    """One decode step of self-attention against the full layered KV cache.

    q: (batch, d) query at the current position, ALREADY scaled by
        d_head**-0.5 (the kernel applies no further scaling).
    kc/vc: (n_layers, batch, n_ctx, d) cache, bf16/f32 or int8 — the
        CURRENT token's K/V row must already be written at ``pos``.
    ks/vs: (n_layers, batch, 1, n_ctx) per-position dequant scales for the
        int8 cache (None -> ones; required when kc/vc are int8).
    anc: (batch, n_ctx) int32 beam-ancestry table, with ``q_per_kv`` the
        beams per window group: row r's key/value at position j live in
        group row ``anc[r, j]`` (a LOCAL index in [0, q_per_kv)). None ->
        every row attends its own cache rows (the non-beam layout).
    layer_idx / pos: int32 scalars — which layer's slab to attend in, and
        the highest valid cache position (keys at j <= pos participate).
    ctx_live: static bound on pos + 1 (a multiple of 128, or n_ctx). Only
        the first ctx_live cache positions stream from HBM — the sampling
        loops re-enter with a bigger bucket as pos grows, so a 256-slot
        cache reads 128 slots for the first ~128 steps. None -> n_ctx.
    Returns (batch, d) float32 attention output (pre out-projection).
    """
    n_layers, b, n_ctx, _ = kc.shape
    if ctx_live is None:
        ctx_live = n_ctx
    ctx_blk = min(n_ctx, max(128, int(ctx_live)))
    if ks is None:
        ks = jnp.ones((n_layers, b, 1, n_ctx), jnp.float32)
    if vs is None:
        vs = jnp.ones((n_layers, b, 1, n_ctx), jnp.float32)
    scalars = jnp.stack([jnp.asarray(layer_idx, jnp.int32),
                         jnp.asarray(pos, jnp.int32)])
    if anc is not None and q_per_kv > 1:
        gps = _beam_groups_per_step(b // q_per_kv, q_per_kv, ctx_blk,
                                    kc.shape[-1], jnp.dtype(kc.dtype).itemsize)
        return _call_beam(scalars, q, anc, kc, ks, vc, vs, n_head,
                          q_per_kv, gps, ctx_blk, interpret)
    return _call(scalars, q, kc, ks, vc, vs, n_head, ctx_blk, interpret)
