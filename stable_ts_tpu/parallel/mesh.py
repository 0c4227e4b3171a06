"""Mesh construction and sharding rules for the Whisper param pytree.

Axes:
- ``dp``: data parallel over batched 30-s windows (the long-form throughput
  axis — SURVEY §5.7's window batching).
- ``tp``: tensor parallel over attention heads / MLP hidden, for fitting or
  accelerating large-v3 on small chips.

Param leaves are stacked per layer (leading ``n_layer`` axis, see
models/whisper/model.py), so every block leaf's sharding spec carries a
leading ``None``.
"""
from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX (no-op on a single host)."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def build_mesh(n_devices: Optional[int] = None,
               tp: Optional[int] = None,
               devices=None) -> Mesh:
    """Build a (dp, tp) mesh over ``n_devices`` (default: all devices).

    ``tp`` defaults to the largest power of two <= 4 dividing n_devices —
    enough tensor parallelism for large-v3 while keeping dp wide for window
    throughput.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0:
                tp = cand
                break
    assert n % tp == 0, f'tp={tp} must divide device count {n}'
    dp = n // tp
    mesh_devices = np.asarray(devices).reshape(dp, tp)
    return Mesh(mesh_devices, axis_names=('dp', 'tp'))


def _block_specs(d_model: int, tp_size: int, n_head: int, cross: bool) -> dict:
    """PartitionSpecs for one (stacked) transformer block."""
    # Shard QKV output dim and MLP hidden over tp; out-projection input dim
    # over tp, so each attention/MLP is a standard Megatron split and XLA
    # inserts one reduce per block.
    head_shardable = n_head % tp_size == 0
    col = P(None, None, 'tp') if head_shardable else P(None, None, None)
    row = P(None, 'tp', None) if head_shardable else P(None, None, None)
    colb = P(None, 'tp') if head_shardable else P(None, None)
    rep2 = P(None, None)
    attn = {
        'q': {'w': col, 'b': colb},
        'k': {'w': col},
        'v': {'w': col, 'b': colb},
        'out': {'w': row, 'b': rep2},
    }
    block = {
        'attn_ln': {'g': rep2, 'b': rep2},
        'attn': attn,
        'mlp_ln': {'g': rep2, 'b': rep2},
        'mlp': {'fc1': {'w': col, 'b': colb},
                'fc2': {'w': row, 'b': rep2}},
    }
    if cross:
        block['cross_attn_ln'] = {'g': rep2, 'b': rep2}
        block['cross_attn'] = {k: dict(v) for k, v in attn.items()}
    return block


def param_specs(dims, tp_size: int) -> dict:
    """PartitionSpec pytree matching the model param pytree."""
    rep1 = P(None)
    rep2 = P(None, None)
    encoder = {
        'conv1': {'w': P(None, None, None), 'b': rep1},
        'conv2': {'w': P(None, None, None), 'b': rep1},
        'pos_emb': rep2,
        'blocks': _block_specs(dims.n_audio_state, tp_size, dims.n_audio_head,
                               cross=False),
        'ln_post': {'g': rep1, 'b': rep1},
    }
    decoder = {
        'token_emb': rep2,  # kept replicated: logits matmul stays local
        'pos_emb': rep2,
        'blocks': _block_specs(dims.n_text_state, tp_size, dims.n_text_head,
                               cross=True),
        'ln': {'g': rep1, 'b': rep1},
    }
    return {'encoder': encoder, 'decoder': decoder}


def param_shardings(mesh: Mesh, dims) -> dict:
    tp_size = mesh.shape['tp']
    specs = param_specs(dims, tp_size)
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), specs,
                        is_leaf=lambda x: isinstance(x, P))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch axis over dp; replicate the rest."""
    return NamedSharding(mesh, P('dp', *([None] * (ndim - 1))))


def shard_params(params, mesh: Mesh, dims):
    """Place a param pytree onto the mesh with tensor-parallel shardings.

    int8-quantized leaves (QuantizedArray) shard q and scale with the same
    spec — both carry the output channel as the last axis.
    """
    from ..models.whisper.quantization import QuantizedArray
    shardings = param_shardings(mesh, dims)

    def put(leaf, sharding):
        if isinstance(leaf, QuantizedArray):
            # the per-channel scale collapses the reduced axis to size 1;
            # replicate any axis the weight spec shards but the scale lacks
            # (row-parallel 'out'/'fc2': spec P(None,'tp',None), scale
            # (..., 1, out)).
            spec = sharding.spec
            scale_spec = P(*[
                None if leaf.scale.shape[i] == 1 else axis
                for i, axis in enumerate(spec)
            ])
            return QuantizedArray(
                jax.device_put(leaf.q, sharding),
                jax.device_put(leaf.scale, NamedSharding(mesh, scale_spec)),
                compute_dtype=leaf.compute_dtype)
        return jax.device_put(leaf, sharding)

    return jax.tree.map(put, params, shardings,
                        is_leaf=lambda x: isinstance(x, QuantizedArray))
