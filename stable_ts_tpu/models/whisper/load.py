"""Checkpoint loading: OpenAI Whisper .pt and HF safetensors -> JAX params.

The reference loads checkpoints through whisper.load_model
(whisper_word_level/original_whisper.py:995) and converts HF weights to the
vanilla layout via a key-remap table (hf_whisper.py:30-51). Here both formats
convert directly into the stacked-layer JAX pytree used by
:mod:`stable_ts_tpu.models.whisper.model`:

- torch Linear stores (out, in) -> transposed to (in, out)
- torch Conv1d stores (out, in, width) -> transposed to (width, in, out)
- per-layer tensors are stacked along a leading n_layer axis (scan layout)
"""
import io
import os
from typing import Any, Dict, Optional

import numpy as np

from .model import ModelDimensions, sinusoids

# Canonical OpenAI model catalog: name -> dims. Lets load_model verify a
# checkpoint and lets tests/benches build correctly-sized synthetic models.
OPENAI_MODEL_DIMS = {
    'tiny.en': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=384, n_audio_head=6,
                    n_audio_layer=4, n_vocab=51864, n_text_ctx=448, n_text_state=384,
                    n_text_head=6, n_text_layer=4),
    'tiny': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=384, n_audio_head=6,
                 n_audio_layer=4, n_vocab=51865, n_text_ctx=448, n_text_state=384,
                 n_text_head=6, n_text_layer=4),
    'base.en': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=512, n_audio_head=8,
                    n_audio_layer=6, n_vocab=51864, n_text_ctx=448, n_text_state=512,
                    n_text_head=8, n_text_layer=6),
    'base': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=512, n_audio_head=8,
                 n_audio_layer=6, n_vocab=51865, n_text_ctx=448, n_text_state=512,
                 n_text_head=8, n_text_layer=6),
    'small.en': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=768, n_audio_head=12,
                     n_audio_layer=12, n_vocab=51864, n_text_ctx=448, n_text_state=768,
                     n_text_head=12, n_text_layer=12),
    'small': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=768, n_audio_head=12,
                  n_audio_layer=12, n_vocab=51865, n_text_ctx=448, n_text_state=768,
                  n_text_head=12, n_text_layer=12),
    'medium.en': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=1024, n_audio_head=16,
                      n_audio_layer=24, n_vocab=51864, n_text_ctx=448, n_text_state=1024,
                      n_text_head=16, n_text_layer=24),
    'medium': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=1024, n_audio_head=16,
                   n_audio_layer=24, n_vocab=51865, n_text_ctx=448, n_text_state=1024,
                   n_text_head=16, n_text_layer=24),
    'large-v1': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
                     n_audio_layer=32, n_vocab=51865, n_text_ctx=448, n_text_state=1280,
                     n_text_head=20, n_text_layer=32),
    'large-v2': dict(n_mels=80, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
                     n_audio_layer=32, n_vocab=51865, n_text_ctx=448, n_text_state=1280,
                     n_text_head=20, n_text_layer=32),
    'large-v3': dict(n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
                     n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
                     n_text_head=20, n_text_layer=32),
    'large-v3-turbo': dict(n_mels=128, n_audio_ctx=1500, n_audio_state=1280,
                           n_audio_head=20, n_audio_layer=32, n_vocab=51866,
                           n_text_ctx=448, n_text_state=1280, n_text_head=20,
                           n_text_layer=4),
}
OPENAI_MODEL_DIMS['large'] = OPENAI_MODEL_DIMS['large-v3']
OPENAI_MODEL_DIMS['turbo'] = OPENAI_MODEL_DIMS['large-v3-turbo']


def _to_np(t) -> np.ndarray:
    if hasattr(t, 'detach'):
        t = t.detach().cpu()
        if t.dtype.__str__() == 'torch.bfloat16':
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _stack(arrs):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *arrs)


def _lin(sd: Dict[str, Any], prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {'w': _to_np(sd[f'{prefix}.weight']).T}
    if bias:
        out['b'] = _to_np(sd[f'{prefix}.bias'])
    return out


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {'g': _to_np(sd[f'{prefix}.weight']), 'b': _to_np(sd[f'{prefix}.bias'])}


def convert_openai_state_dict(sd: Dict[str, Any], dims: ModelDimensions) -> Dict[str, Any]:
    """OpenAI Whisper state_dict -> stacked JAX param pytree."""
    def attn(prefix):
        return {
            'q': _lin(sd, f'{prefix}.query'),
            'k': _lin(sd, f'{prefix}.key', bias=False),
            'v': _lin(sd, f'{prefix}.value'),
            'out': _lin(sd, f'{prefix}.out'),
        }

    enc_blocks = []
    for i in range(dims.n_audio_layer):
        p = f'encoder.blocks.{i}'
        enc_blocks.append({
            'attn_ln': _ln(sd, f'{p}.attn_ln'),
            'attn': attn(f'{p}.attn'),
            'mlp_ln': _ln(sd, f'{p}.mlp_ln'),
            'mlp': {'fc1': _lin(sd, f'{p}.mlp.0'), 'fc2': _lin(sd, f'{p}.mlp.2')},
        })
    dec_blocks = []
    for i in range(dims.n_text_layer):
        p = f'decoder.blocks.{i}'
        dec_blocks.append({
            'attn_ln': _ln(sd, f'{p}.attn_ln'),
            'attn': attn(f'{p}.attn'),
            'cross_attn_ln': _ln(sd, f'{p}.cross_attn_ln'),
            'cross_attn': attn(f'{p}.cross_attn'),
            'mlp_ln': _ln(sd, f'{p}.mlp_ln'),
            'mlp': {'fc1': _lin(sd, f'{p}.mlp.0'), 'fc2': _lin(sd, f'{p}.mlp.2')},
        })

    encoder = {
        'conv1': {'w': _to_np(sd['encoder.conv1.weight']).transpose(2, 1, 0),
                  'b': _to_np(sd['encoder.conv1.bias'])},
        'conv2': {'w': _to_np(sd['encoder.conv2.weight']).transpose(2, 1, 0),
                  'b': _to_np(sd['encoder.conv2.bias'])},
        'pos_emb': _to_np(sd.get('encoder.positional_embedding',
                                 sinusoids(dims.n_audio_ctx, dims.n_audio_state))),
        'blocks': _stack(enc_blocks),
        'ln_post': _ln(sd, 'encoder.ln_post'),
    }
    decoder = {
        'token_emb': _to_np(sd['decoder.token_embedding.weight']),
        'pos_emb': _to_np(sd['decoder.positional_embedding']),
        'blocks': _stack(dec_blocks),
        'ln': _ln(sd, 'decoder.ln'),
    }
    return {'encoder': encoder, 'decoder': decoder}


# HF transformers key -> OpenAI key fragments (cf. reference hf_whisper.py:30-51).
_HF_TO_OPENAI = [
    ('model.', ''),
    ('layers', 'blocks'),
    ('fc1', 'mlp.0'),
    ('fc2', 'mlp.2'),
    ('final_layer_norm', 'mlp_ln'),
    ('q_proj', 'query'),
    ('k_proj', 'key'),
    ('v_proj', 'value'),
    ('out_proj', 'out'),
    ('self_attn_layer_norm', 'attn_ln'),
    ('self_attn', 'attn'),
    ('encoder_attn_layer_norm', 'cross_attn_ln'),
    ('encoder_attn', 'cross_attn'),
    ('embed_positions.weight', 'positional_embedding'),
    ('embed_tokens', 'token_embedding'),
    ('encoder.layer_norm', 'encoder.ln_post'),
    ('decoder.layer_norm', 'decoder.ln'),
]


def hf_key_to_openai(key: str) -> str:
    for old, new in _HF_TO_OPENAI:
        key = key.replace(old, new)
    return key


def convert_hf_state_dict(sd: Dict[str, Any], dims: ModelDimensions) -> Dict[str, Any]:
    remapped = {}
    for k, v in sd.items():
        if k == 'proj_out.weight':
            continue  # tied to token embedding
        remapped[hf_key_to_openai(k)] = v
    return convert_openai_state_dict(remapped, dims)


def load_openai_checkpoint(path: str):
    """Load an OpenAI .pt checkpoint -> (ModelDimensions, params pytree)."""
    import torch
    with open(path, 'rb') as f:
        checkpoint = torch.load(io.BytesIO(f.read()), map_location='cpu',
                                weights_only=False)
    dims = ModelDimensions(**checkpoint['dims'])
    params = convert_openai_state_dict(checkpoint['model_state_dict'], dims)
    return dims, params


def load_hf_checkpoint(model_dir: str):
    """Load an HF Whisper directory (config.json + safetensors) -> (dims, params)."""
    import json
    from safetensors.numpy import load_file
    with open(os.path.join(model_dir, 'config.json')) as f:
        cfg = json.load(f)
    dims = ModelDimensions(
        n_mels=cfg['num_mel_bins'],
        n_audio_ctx=cfg['max_source_positions'],
        n_audio_state=cfg['d_model'],
        n_audio_head=cfg['encoder_attention_heads'],
        n_audio_layer=cfg['encoder_layers'],
        n_vocab=cfg['vocab_size'],
        n_text_ctx=cfg['max_target_positions'],
        n_text_state=cfg['d_model'],
        n_text_head=cfg['decoder_attention_heads'],
        n_text_layer=cfg['decoder_layers'],
    )
    sd = {}
    for fname in sorted(os.listdir(model_dir)):
        if fname.endswith('.safetensors'):
            sd.update(load_file(os.path.join(model_dir, fname)))
    if not sd:
        raise FileNotFoundError(f'no .safetensors files in {model_dir}')
    params = convert_hf_state_dict(sd, dims)
    return dims, params


def load_mlx_checkpoint(model_dir: str):
    """Load an MLX-community Whisper directory -> (dims, params).

    The mlx-community layout (mlx-examples whisper/convert.py) keeps
    OpenAI's state-dict key names and a config.json holding the
    ``ModelDimensions`` fields directly; only the Conv1d weights differ —
    MLX stores (out, kernel, in) where torch stores (out, in, kernel).
    Transpose those back and the OpenAI converter applies unchanged, so
    MLX checkpoints run on the JAX/TPU engine (the reference instead runs
    them on Apple's MLX runtime, mlx_whisper.py:61-65 — on TPU the engine
    swap IS the feature).
    """
    import json
    from safetensors.numpy import load_file
    with open(os.path.join(model_dir, 'config.json')) as f:
        cfg = json.load(f)
    if cfg.get('quantization'):
        raise NotImplementedError(
            'quantized MLX checkpoints are not supported; convert from the '
            'float weights (dq=True re-quantizes for TPU at load time)')
    fields = {f.name for f in ModelDimensions.__dataclass_fields__.values()} \
        if hasattr(ModelDimensions, '__dataclass_fields__') else None
    dims_kwargs = {k: v for k, v in cfg.items()
                   if fields is None or k in fields}
    dims = ModelDimensions(**dims_kwargs)
    sd = {}
    for fname in sorted(os.listdir(model_dir)):
        if fname.endswith('.safetensors'):
            sd.update(load_file(os.path.join(model_dir, fname)))
    if not sd:
        raise FileNotFoundError(f'no .safetensors files in {model_dir}')
    for key in list(sd):
        if 'conv' in key and sd[key].ndim == 3:
            sd[key] = np.ascontiguousarray(sd[key].transpose(0, 2, 1))
    params = convert_openai_state_dict(sd, dims)
    return dims, params


def is_mlx_checkpoint_dir(model_dir: str) -> bool:
    """MLX config.json carries ModelDimensions fields ('n_mels'); HF uses
    'num_mel_bins'."""
    cfg_path = os.path.join(model_dir, 'config.json')
    if not os.path.isfile(cfg_path):
        return False
    import json
    try:
        with open(cfg_path) as f:
            return 'n_mels' in json.load(f)
    except (ValueError, OSError):
        return False


def save_openai_checkpoint(path: str, dims: ModelDimensions, params: Dict[str, Any]):
    """Write params back to the OpenAI .pt layout (round-trip/testing aid)."""
    import torch

    sd = {}

    def put_lin(prefix, p, bias=True):
        sd[f'{prefix}.weight'] = torch.from_numpy(np.asarray(p['w']).T.copy())
        if bias:
            sd[f'{prefix}.bias'] = torch.from_numpy(np.asarray(p['b']).copy())

    def put_ln(prefix, p):
        sd[f'{prefix}.weight'] = torch.from_numpy(np.asarray(p['g']).copy())
        sd[f'{prefix}.bias'] = torch.from_numpy(np.asarray(p['b']).copy())

    def put_attn(prefix, p):
        put_lin(f'{prefix}.query', p['q'])
        put_lin(f'{prefix}.key', p['k'], bias=False)
        put_lin(f'{prefix}.value', p['v'])
        put_lin(f'{prefix}.out', p['out'])

    enc = params['encoder']
    sd['encoder.conv1.weight'] = torch.from_numpy(
        np.asarray(enc['conv1']['w']).transpose(2, 1, 0).copy())
    sd['encoder.conv1.bias'] = torch.from_numpy(np.asarray(enc['conv1']['b']).copy())
    sd['encoder.conv2.weight'] = torch.from_numpy(
        np.asarray(enc['conv2']['w']).transpose(2, 1, 0).copy())
    sd['encoder.conv2.bias'] = torch.from_numpy(np.asarray(enc['conv2']['b']).copy())
    sd['encoder.positional_embedding'] = torch.from_numpy(np.asarray(enc['pos_emb']).copy())
    import jax
    n_enc = dims.n_audio_layer
    for i in range(n_enc):
        block = jax.tree.map(lambda x, i=i: np.asarray(x)[i], enc['blocks'])
        p = f'encoder.blocks.{i}'
        put_ln(f'{p}.attn_ln', block['attn_ln'])
        put_attn(f'{p}.attn', block['attn'])
        put_ln(f'{p}.mlp_ln', block['mlp_ln'])
        put_lin(f'{p}.mlp.0', block['mlp']['fc1'])
        put_lin(f'{p}.mlp.2', block['mlp']['fc2'])
    put_ln('encoder.ln_post', enc['ln_post'])

    dec = params['decoder']
    sd['decoder.token_embedding.weight'] = torch.from_numpy(
        np.asarray(dec['token_emb']).copy())
    sd['decoder.positional_embedding'] = torch.from_numpy(
        np.asarray(dec['pos_emb']).copy())
    for i in range(dims.n_text_layer):
        block = jax.tree.map(lambda x, i=i: np.asarray(x)[i], dec['blocks'])
        p = f'decoder.blocks.{i}'
        put_ln(f'{p}.attn_ln', block['attn_ln'])
        put_attn(f'{p}.attn', block['attn'])
        put_ln(f'{p}.cross_attn_ln', block['cross_attn_ln'])
        put_attn(f'{p}.cross_attn', block['cross_attn'])
        put_ln(f'{p}.mlp_ln', block['mlp_ln'])
        put_lin(f'{p}.mlp.0', block['mlp']['fc1'])
        put_lin(f'{p}.mlp.2', block['mlp']['fc2'])
    put_ln('decoder.ln', dec['ln'])

    torch.save({'dims': dims.__dict__, 'model_state_dict': sd}, path)
