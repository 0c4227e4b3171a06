"""Median filter over the last axis (used to smooth attention weights).

Equivalent to whisper.timing.median_filter (called by the reference at
timing.py:110): reflect-pad by half the width, sliding-window median.
Implemented as a stack of shifted views + jnp.median — a fully vectorized
sort network on the VPU; no Pallas needed at width 7.
"""
from functools import partial

import jax
import jax.numpy as jnp


# Batcher odd-even mergesort network for 8 lanes (19 compare-exchanges).
# Sorting [7 reals, +inf] and taking index 3 yields the median of 7; the
# whole filter then lowers to a fused chain of elementwise min/max over the
# shifted views — no (..., W) window stack materialized in HBM and no
# generic sort, which is what made the stacked-jnp.median formulation the
# hot spot of the batched word-timing pass.
_BATCHER8 = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
             (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
             (1, 2), (3, 4), (5, 6))


def _median7(win):
    lanes = list(win) + [jnp.full_like(win[0], jnp.inf)]
    for a, b in _BATCHER8:
        lo = jnp.minimum(lanes[a], lanes[b])
        hi = jnp.maximum(lanes[a], lanes[b])
        lanes[a], lanes[b] = lo, hi
    return lanes[3]


@partial(jax.jit, static_argnames=('filter_width',))
def median_filter(x: jnp.ndarray, filter_width: int = 7) -> jnp.ndarray:
    assert filter_width > 0 and filter_width % 2 == 1, \
        '`filter_width` should be an odd number'
    if x.shape[-1] <= filter_width // 2:
        return x
    pad = filter_width // 2
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    padded = jnp.pad(x, pad_widths, mode='reflect')
    views = [padded[..., i:i + x.shape[-1]] for i in range(filter_width)]
    if filter_width == 7:
        return _median7(views)
    windows = jnp.stack(views, axis=-1)
    return jnp.median(windows, axis=-1)
