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
block_until_ready() does not synchronize.  jax.device_put alone is
asynchronous too, so the upload is timed as device_put + a pre-compiled
reduction materialized to host, minus the warm scalar roundtrip — the
transfer cannot complete later than that window ends.  Random data (not
zeros) defeats any transport-level compression.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    mb = 16.0
    x = (np.random.default_rng(0)
         .integers(-2**31, 2**31, size=(2048, 2048), dtype=np.int64)
         .astype(np.float32))  # 16 MB of incompressible noise
    dev = jax.devices()[0]
    f = jax.jit(lambda a: (a * 2).sum())

    # Pre-compile the reduction and measure the warm scalar roundtrip on
    # an array that is ALREADY resident, so the timed upload window below
    # only pays transfer + one warm dispatch.
    resident = jax.device_put(x, dev)
    float(f(resident))  # compile
    t0 = time.perf_counter()
    float(f(resident))
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    a = jax.device_put(x, dev)
    float(f(a))  # forces the upload to have completed
    up = max(time.perf_counter() - t0 - warm, 1e-6)

    out = {
        'platform': dev.platform,
        'upload_MBps': round(mb / up, 1),
        'warm_roundtrip_s': round(warm, 4),
    }
    out['healthy'] = out['upload_MBps'] > 100 and warm < 0.5
    print(json.dumps(out))
    return 0 if out['healthy'] else 1


if __name__ == '__main__':
    sys.exit(main())
