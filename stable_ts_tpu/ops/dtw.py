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
tie-breaking (diagonal > down > right) matches the reference DP exactly
because every cost entry is final when re-inspected.
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
            if c0 <= c1 and c0 <= c2:
                c, t = c0, 0
            elif c1 <= c0 and c1 <= c2:
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


def _traceback_from_cost(cost: np.ndarray):
    """Host traceback over the final cost matrix; diag-first tie-breaking."""
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
            if c0 <= c1 and c0 <= c2:
                i -= 1
                j -= 1
            elif c1 <= c0 and c1 <= c2:
                i -= 1
            else:
                j -= 1
    return (np.array(text_indices)[::-1], np.array(time_indices)[::-1])


def dtw(x, device: bool = True):
    """DTW path for cost matrix ``x``; device DP + host traceback by default."""
    if device:
        cost = np.asarray(dtw_cost_jax(jnp.asarray(x)), dtype=np.float64)
        return _traceback_from_cost(cost)
    return dtw_numpy(np.asarray(x))
