"""Mamba-1 LM stack tests: forward, decode-step consistency, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.models.mamba_lm import (
    Mamba, MambaConfig, MambaLMHeadModel, generate,
)


def test_mamba_block_forward():
    m = Mamba(d_model=16, d_state=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    v = m.init({"params": jax.random.PRNGKey(1)}, x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_decode_step_matches_full_forward():
    """Token-by-token decoding must equal the full-sequence forward —
    the same equivalence the reference relies on for incremental decoding
    (`mamba_simple.py:step`)."""
    cfg = MambaConfig(d_model=16, n_layer=2, vocab_size=50, d_state=4)
    model = MambaLMHeadModel(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 50, (2, 9)),
                      jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0)}, ids)
    full_logits = model.apply(v, ids)                   # [B, L, vocab]

    cache = model.apply(v, 2, method=MambaLMHeadModel.init_cache)
    step_logits = []
    for t in range(ids.shape[1]):
        lg, cache = model.apply(v, ids[:, t], cache,
                                method=MambaLMHeadModel.decode_step)
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(full_logits), rtol=2e-3, atol=2e-3)


def test_generate_greedy_deterministic():
    cfg = MambaConfig(d_model=16, n_layer=2, vocab_size=50, d_state=4)
    model = MambaLMHeadModel(cfg)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0)}, ids)
    out1 = generate(model, v, ids, max_new_tokens=5)
    out2 = generate(model, v, ids, max_new_tokens=5)
    assert out1.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert int(out1.max()) < 56  # padded vocab


def test_generate_sampling_runs():
    cfg = MambaConfig(d_model=16, n_layer=1, vocab_size=50, d_state=4)
    model = MambaLMHeadModel(cfg)
    ids = jnp.asarray([[1, 2]], jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0)}, ids)
    out = generate(model, v, ids, max_new_tokens=4, temperature=0.8, top_k=10,
                   rng=jax.random.PRNGKey(5))
    assert out.shape == (1, 6)
