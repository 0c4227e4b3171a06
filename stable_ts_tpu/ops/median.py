"""Median filter over the last axis (used to smooth attention weights).

Equivalent to whisper.timing.median_filter (called by the reference at
timing.py:110): reflect-pad by half the width, sliding-window median.
Implemented as a stack of shifted views + jnp.median — a fully vectorized
sort network on the VPU; no Pallas needed at width 7.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('filter_width',))
def median_filter(x: jnp.ndarray, filter_width: int = 7) -> jnp.ndarray:
    assert filter_width > 0 and filter_width % 2 == 1, \
        '`filter_width` should be an odd number'
    if x.shape[-1] <= filter_width // 2:
        return x
    pad = filter_width // 2
    pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    padded = jnp.pad(x, pad_widths, mode='reflect')
    windows = jnp.stack(
        [padded[..., i:i + x.shape[-1]] for i in range(filter_width)], axis=-1)
    return jnp.median(windows, axis=-1)
