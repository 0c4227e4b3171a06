"""Monotonic DTW alignment of text tokens to audio frames.

Equivalent to whisper.timing.dtw (Numba ``dtw_cpu`` / Triton ``dtw_cuda``;
the reference calls it at timing.py:195): given a cost matrix
``x (n_tokens, n_frames)``, find the minimum-cost monotonic path with moves
diagonal / down / right, returning the (text_indices, time_indices) path.

TPU-first design: the classic DP
    C[i, j] = x[i, j] + min(C[i-1, j-1], C[i-1, j], C[i, j-1])
has a serial dependency along each row, but the row recurrence
    C[i, j] = x[i, j] + min(A[j], C[i, j-1]),   A[j] = min(C[i-1, j-1], C[i-1, j])
unrolls to
    C[i, j] = S[j] + cummin_k<=j (A[k] - S[k-1]),   S = prefix-sum of x[i, :]
i.e. one prefix sum + one cumulative min per row — both vectorized VPU scans.
Rows advance under ``lax.scan`` (n_tokens sequential steps of 1500-wide vector
work instead of n_tokens * n_frames scalar steps). The backtrace is inherently
serial and O(N+M), so it runs on host from the downloaded cost matrix —
tie-breaking matches whisper's ``dtw_cpu`` exactly (strict <: diagonal only
when strictly smallest, then up, ties fall to "move left"), and re-inspecting
final cost entries reproduces the DP-time decisions because every entry is
final by traceback time.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e30  # finite "infinity": keeps cummin arithmetic NaN-free in f32


def dtw_numpy(x: np.ndarray):
    """Reference NumPy DP + traceback. x: (N, M) cost matrix."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    trace = np.full((N + 1, M + 1), -1, dtype=np.int8)
    cost[0, 0] = 0.0
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            # whisper dtw_cpu's strict-< tie order: equal costs move left
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t
    return _traceback_from_trace(trace)


def _traceback_from_trace(trace: np.ndarray):
    i, j = trace.shape[0] - 1, trace.shape[1] - 1
    trace[0, :] = 2  # along the top edge move left
    trace[:, 0] = 1  # along the left edge move up
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError('unexpected trace[i, j]')
    return (np.array(text_indices)[::-1], np.array(time_indices)[::-1])


@jax.jit
def dtw_cost_jax(x: jnp.ndarray) -> jnp.ndarray:
    """Full (N+1, M+1) DTW cost matrix on device via per-row vector scans."""
    x = x.astype(jnp.float32)
    N, M = x.shape

    def row_step(prev_row, x_row):
        # prev_row: C[i-1, 0:M+1]. A[j] = min(C[i-1, j-1], C[i-1, j]) for j>=1.
        a = jnp.minimum(prev_row[:-1], prev_row[1:])  # (M,)
        s = jnp.cumsum(x_row)                          # S[j] = sum x[i, 0..j]
        s_prev = jnp.concatenate([jnp.zeros(1, x.dtype), s[:-1]])
        # C[i, j] = S[j] + cummin_{k<=j}(A[k] - S[k-1])
        running = jax.lax.associative_scan(jnp.minimum, a - s_prev)
        row = jnp.clip(s + running, max=_INF)
        full_row = jnp.concatenate([jnp.full((1,), _INF, x.dtype), row])
        return full_row, full_row

    first_row = jnp.concatenate([jnp.zeros(1, x.dtype),
                                 jnp.full((M,), _INF, x.dtype)])
    _, rows = jax.lax.scan(row_step, first_row, x)
    return jnp.concatenate([first_row[None], rows], axis=0)


# -- Pallas TPU kernel -----------------------------------------------------------------
#
# Same row recurrence as dtw_cost_jax, but the whole DP state lives in VMEM
# for the kernel's lifetime: the carried row never round-trips to HBM between
# row steps, and the prefix-sum / cumulative-min scans are unrolled
# log-doubling shifts (11 VPU passes each at M=1536) instead of XLA scan
# plumbing. One grid program per batch element.

def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _dtw_row_kernel(xp_ref, cost_ref, prev_ref):
    """One grid step = one DP row, all batch elements in lockstep.

    xp_ref: (1, B, W) — row i-1 of the zero-padded cost inputs (clamped at 0);
    cost_ref: (1, B, W) — row i of the DP matrix to produce;
    prev_ref: (B, W) scratch — carries row i-1 across grid steps (TPU grid
    iterations run sequentially on one core, so scratch persists).

    Batch rides the sublane axis: the per-row vector work is identical for
    every matrix, so B matrices cost the same instruction stream as one.
    """
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    width = prev_ref.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, prev_ref.shape, 1)  # (B, W)

    def shift_right(vec, amount, fill):
        rolled = pltpu.roll(vec, shift=amount, axis=1)
        return jnp.where(col < amount, fill, rolled)

    @pl.when(i == 0)
    def _():
        first = jnp.where(col == 0, 0.0, _INF)
        cost_ref[0, :, :] = first
        prev_ref[:, :] = first

    @pl.when(i > 0)
    def _():
        prev = prev_ref[:, :]
        xrow = xp_ref[0, :, :]
        a = jnp.minimum(shift_right(prev, 1, _INF), prev)  # min(C[i-1,j-1], C[i-1,j])
        s = xrow                                            # → S[j] = sum x[i, 1..j]
        dist = 1
        while dist < width:
            s = s + shift_right(s, dist, 0.0)
            dist *= 2
        s_prev = shift_right(s, 1, 0.0)
        g = jnp.where(col == 0, _INF, a - s_prev)
        dist = 1
        while dist < width:                                 # cummin_{k<=j} g[k]
            g = jnp.minimum(g, shift_right(g, dist, _INF))
            dist *= 2
        row = jnp.minimum(s + g, _INF)
        row = jnp.where(col == 0, _INF, row)
        cost_ref[0, :, :] = row
        prev_ref[:, :] = row


@partial(jax.jit, static_argnames=('interpret',))
def dtw_cost_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """DTW cost matrices on TPU via Pallas. x: (N, M) or (B, N, M) → full
    (…, N+1, M+1) cost matrix (same contents as :func:`dtw_cost_jax`).

    Grid = rows; Pallas pipelines the per-row HBM↔VMEM transfers behind the
    row computation, and the whole batch advances in lockstep on the sublane
    axis, so batched window timing pays ~one matrix's latency total.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    batch, n_rows, m_cols = x.shape
    width = _round_up(m_cols + 1, 128)
    # leading zero column (cost col 0) + lane padding; padded cells cost 0
    # and can never win a cummin for j <= M, so the slice below is exact.
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (1, width - m_cols - 1)))
    xp = jnp.moveaxis(xp, 0, 1).reshape(n_rows, batch, width)  # row-major rows

    cost = pl.pallas_call(
        _dtw_row_kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows + 1, batch, width), jnp.float32),
        grid=(n_rows + 1,),
        in_specs=[pl.BlockSpec((1, batch, width),
                               lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, batch, width), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((batch, width), jnp.float32)],
        interpret=interpret,
    )(xp)
    cost = jnp.moveaxis(cost, 1, 0)[:, :, :m_cols + 1]
    return cost[0] if squeeze else cost


def _traceback_from_cost(cost: np.ndarray):
    """Host traceback over the final cost matrix.

    Uses whisper dtw_cpu's strict-< tie order (diagonal only when strictly
    smallest, then up, ties move left) so flat/equal-cost regions — silence,
    cropped columns — trace the same path as the reference."""
    N, M = cost.shape[0] - 1, cost.shape[1] - 1
    i, j = N, M
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                i -= 1
                j -= 1
            elif c1 < c0 and c1 < c2:
                i -= 1
            else:
                j -= 1
    return (np.array(text_indices)[::-1], np.array(time_indices)[::-1])


@jax.jit
def dtw_jumps_device(cost: jnp.ndarray, n_rows: jnp.ndarray,
                     m_cols: jnp.ndarray) -> jnp.ndarray:
    """Device-side traceback: per-token jump frames straight from the DP.

    ``cost``: (B, R+1, F+1) batched cost matrices (padding beyond each
    window's real (n_rows[b], m_cols[b]) is ignored — the walk starts at the
    real corner). Returns (B, R) int32 where row t holds the frame index of
    text row t's first path point — exactly ``_jumps_from_cost`` of the
    cropped matrix (same strict-< tie order), without downloading the
    multi-MB cost matrix to host: only this tiny index array crosses PCIe.

    The walk is a ``lax.while_loop`` of at most N+M scalar steps; under
    ``vmap`` every window advances in lockstep (masked), so a batch costs
    one window's latency.
    """
    def walk(cost_b, n, m):
        rows = cost_b.shape[0] - 1

        def moving(state):
            i, j, _ = state
            return (i > 0) | (j > 0)

        def step(state):
            i, j, jt = state
            im1, jm1 = jnp.maximum(i - 1, 0), jnp.maximum(j - 1, 0)
            c_diag = cost_b[im1, jm1]
            c_up = cost_b[im1, j]
            c_left = cost_b[i, jm1]
            diag = (c_diag < c_up) & (c_diag < c_left)
            up = (c_up < c_diag) & (c_up < c_left) & ~diag
            # matrix edges force the move (unreachable with INF borders,
            # kept for malformed inputs)
            diag &= (i > 0) & (j > 0)
            up = jnp.where(j == 0, i > 0, up & (i > 0))
            dec_i = diag | up
            # i is about to leave row i: this state's path point (i-1, j-1)
            # is text row i-1's FIRST point in forward order
            jt = jnp.where(dec_i, jt.at[im1].set(jm1), jt)
            i = jnp.where(dec_i, i - 1, i)
            j = jnp.where(diag | ~dec_i, j - 1, j)
            return i, j, jt

        jt0 = jnp.zeros((rows,), jnp.int32)
        _, _, jt = jax.lax.while_loop(moving, step, (n, m, jt0))
        return jt

    return jax.vmap(walk)(cost.astype(jnp.float32),
                          n_rows.astype(jnp.int32), m_cols.astype(jnp.int32))


def _dtw_backend() -> str:
    import os
    pref = os.environ.get('STABLE_TS_TPU_DTW', 'auto')
    if pref in ('pallas', 'scan', 'numpy'):
        return pref
    return 'pallas' if jax.default_backend() == 'tpu' else 'scan'


def _use_pallas() -> bool:
    return _dtw_backend() == 'pallas'


def dtw(x, device: bool = True):
    """DTW path for cost matrix ``x``; device DP + host traceback by default.

    On a TPU backend the cost matrix comes from the Pallas kernel (VMEM-
    resident DP); elsewhere from the portable scan formulation. Override with
    STABLE_TS_TPU_DTW=pallas|scan|numpy (numpy = pure-host DP, the escape
    hatch when the device path itself is suspect)."""
    backend = _dtw_backend()
    if not device or backend == 'numpy':
        return dtw_numpy(np.asarray(x))
    fn = dtw_cost_pallas if backend == 'pallas' else dtw_cost_jax
    cost = np.asarray(fn(jnp.asarray(x)), dtype=np.float64)
    return _traceback_from_cost(cost)
