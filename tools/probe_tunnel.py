"""Tunnel-health probe: is the TPU link fit for benchmarking?

The axon tunnel's host->device bandwidth swings by orders of magnitude
(measured 630 MB/s and 1.0 MB/s within one hour on 2026-08-18) while
device compute stays normal. Run this BEFORE trusting any bench number:

    python tools/probe_tunnel.py

Prints one JSON line. Rules of thumb:
  upload_MBps > 100   -> healthy, bench away
  upload_MBps 10-100  -> usable; transfer-heavy phases inflate ~2-10x
  upload_MBps < 10    -> degraded; e2e numbers are transport artifacts
                         (signature: huge log_mel phase, normal decode_wait)

Timing uses host materialization (float(...)) because the tunnel's
block_until_ready() does not synchronize.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    t0 = time.perf_counter()
    x = np.zeros((2048, 2048), dtype=np.float32)  # 16 MB
    a = jax.device_put(x, jax.devices()[0])
    up = time.perf_counter() - t0

    f = jax.jit(lambda a: (a * 2).sum())
    t0 = time.perf_counter()
    float(f(a))  # includes compile
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(a))
    warm = time.perf_counter() - t0

    out = {
        'platform': jax.devices()[0].platform,
        'upload_MBps': round(16.0 / up, 1),
        'first_roundtrip_s': round(first, 3),
        'warm_roundtrip_s': round(warm, 4),
    }
    out['healthy'] = out['upload_MBps'] > 100 and warm < 0.5
    print(json.dumps(out))
    return 0 if out['healthy'] else 1


if __name__ == '__main__':
    sys.exit(main())
