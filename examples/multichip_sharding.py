"""Shard batched-window transcription across a TPU mesh.

Windows are the data-parallel axis (SURVEY §5.7): on an N-chip mesh, a batch
of 30-second windows is split over the `dp` axis while (optionally) the model
weights are tensor-sharded over `tp`. XLA inserts all collectives.

Run on CPU with a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python examples/multichip_sharding.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from stable_ts_tpu.parallel.mesh import build_mesh, data_sharding, param_shardings
from stable_ts_tpu.models.whisper.model import (encoder_apply, init_params,
                                                tiny_test_dims)


def main():
    mesh = build_mesh()  # dp x tp over all visible devices
    print('mesh:', dict(mesh.shape))

    dims = tiny_test_dims()
    params = init_params(dims, seed=0)
    # place weights: replicated over dp, tensor-sharded over tp
    params = jax.tree.map(jax.device_put, params, param_shardings(mesh, dims))

    batch = mesh.shape['dp'] * 2
    mels = jnp.zeros((batch, dims.n_mels, 3000), jnp.float32)
    mels = jax.device_put(mels, data_sharding(mesh, ndim=3))

    fwd = jax.jit(lambda p, m: encoder_apply(p['encoder'], m, dims.n_audio_head))
    out = fwd(params, mels)
    print('encoder out:', out.shape, 'sharding:', out.sharding)


if __name__ == '__main__':
    main()
