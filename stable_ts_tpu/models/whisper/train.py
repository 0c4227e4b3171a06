"""Training / fine-tuning step for the JAX Whisper.

The reference has no training path (it wraps pretrained checkpoints); a
native train step is provided here because the framework targets production
deployment, where domain fine-tuning of the timing model is routine, and it
exercises the full dp+tp sharded backward path the multichip dry-run
validates.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .model import ModelDimensions, decoder_apply, encoder_apply


def cross_entropy_loss(params, mel: jnp.ndarray, tokens: jnp.ndarray,
                       dims: ModelDimensions,
                       label_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Teacher-forced next-token CE over the decoder. tokens: (B, T) int32."""
    xa = encoder_apply(params['encoder'], mel, dims.n_audio_head)
    logits, _ = decoder_apply(params['decoder'], tokens[:, :-1], xa,
                              dims.n_text_head)
    targets = tokens[:, 1:]
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logprobs, targets[..., None], axis=-1)[..., 0]
    if label_mask is not None:
        mask = label_mask[:, 1:].astype(jnp.float32)
        return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
    return nll.mean()


def make_train_step(dims: ModelDimensions, optimizer=None):
    """Build (init_opt_state, train_step). ``train_step`` is jit-able and
    pjit-shardable: grads reduce over dp, tp-sharded matmuls stay sharded."""
    if optimizer is None:
        optimizer = optax.adamw(1e-5)

    def init_opt_state(params):
        return optimizer.init(params)

    def train_step(params, opt_state, mel, tokens, label_mask=None):
        loss, grads = jax.value_and_grad(cross_entropy_loss)(
            params, mel, tokens, dims, label_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt_state, train_step
