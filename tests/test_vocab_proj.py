"""Parity of the streaming vocab-projection kernel vs the XLA spelling."""
import jax.numpy as jnp
import numpy as np
import pytest

from stable_ts_tpu.ops.vocab_proj import vocab_logits_kernel


@pytest.mark.parametrize('m,k,v', [
    (16, 64, 1031),    # vocab not a tile multiple -> padded rows sliced off
    (1, 128, 2048),    # single row (greedy b=1), sublane padding
    (80, 384, 4096),   # beam rows x tiny-model width
])
def test_matches_xla_dot(m, k, v, monkeypatch):
    monkeypatch.setenv('STABLE_TS_TPU_VOCAB', 'interpret')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((v, k)), jnp.float32)
    got = vocab_logits_kernel(x, emb, block_v=512)
    want = jnp.dot(x, emb.T)
    assert got.shape == (m, v) and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_decoder_step_routes_through_kernel(monkeypatch):
    """_vocab_logits picks the kernel for decode-step shapes when forced on
    and the result matches the XLA path bit-for-bit in interpret mode."""
    from stable_ts_tpu.models.whisper import model as M
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 96)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2048, 96)), jnp.float32)
    monkeypatch.setenv('STABLE_TS_TPU_VOCAB', 'off')
    want = M._vocab_logits(x, emb)
    monkeypatch.setenv('STABLE_TS_TPU_VOCAB', 'interpret')
    got = M._vocab_logits(x, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
