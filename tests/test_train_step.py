"""Train-step tests: loss decreases, BN stats update, checkpoint roundtrip,
KAN grid update integrates with the state."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.train.train_state import (
    TrainState, init_train_state, make_train_step, make_eval_step,
    kan_grid_update, cross_entropy_loss,
)
from medical_image_classification_tpu.train.optim import (
    make_optimizer, make_schedule, no_weight_decay_mask,
)

SMALL = dict(depths=(1, 1), dims=(16, 32), drop_path_rate=0.0, ssd_headdim=8)


def _setup(name="medmamba", num_classes=4, lr=1e-3, **kw):
    model = create_model(name, num_classes=num_classes, d_state=4, **SMALL, **kw)
    tx = make_optimizer("adam", lr)
    rng = jax.random.PRNGKey(0)
    imgs = np.random.RandomState(0).randint(
        0, 256, (4, 32, 32, 3), dtype=np.uint8)
    labels = np.array([0, 1, 2, 3], dtype=np.int32)
    state = init_train_state(model, rng, jnp.asarray(imgs), tx)
    return model, state, jnp.asarray(imgs), jnp.asarray(labels)


def test_loss_decreases_on_overfit_batch():
    model, state, imgs, labels = _setup()
    step = make_train_step(model, donate=False)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(12):
        state, m = step(state, imgs, labels, rng)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05, losses
    assert all(b <= a + 1e-3 for a, b in zip(losses, losses[1:])), losses
    assert int(state.step) == 12


def test_eval_step_counts_correct():
    model, state, imgs, labels = _setup()
    ev = make_eval_step(model)
    correct, logits = ev(state, imgs, labels)
    assert logits.shape == (4, 4)
    assert 0 <= int(correct) <= 4


def test_schedule_factory():
    for name in ["constant", "step", "multistep", "exponential", "cosine",
                 "warmup_cosine", "warmup_constant", "fusion_exp"]:
        s = make_schedule(name, 1e-3, steps_per_epoch=10, epochs=5,
                          warmup_epochs=1)
        v0, v1 = float(s(0)), float(s(40))
        assert np.isfinite(v0) and np.isfinite(v1)


def test_optimizer_factory():
    params = {"w": jnp.ones((3, 3)), "A_logs": jnp.ones((2,))}
    for name in ["adam", "adamw", "sgd", "momentum", "nesterov", "rmsprop",
                 "adagrad", "lamb", "lion"]:
        tx = make_optimizer(name, 1e-3, weight_decay=0.01,
                            no_decay_mask=no_weight_decay_mask(params),
                            grad_clip=1.0)
        st = tx.init(params)
        up, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params), st,
                          params)
        assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(up))


def test_optimizer_flatten_matches_per_leaf():
    # optax.flatten(adam) must be mathematically identical to per-leaf adam
    # (it is what bench_fusion measures — graph-size + small-op win only)
    params = {"w": jnp.ones((3, 3)), "b": jnp.arange(4, dtype=jnp.float32),
              "nest": {"u": jnp.full((2, 5), 0.5)}}
    grads = jax.tree_util.tree_map(
        lambda p: jnp.cos(p) * 0.1 + 0.01, params)
    ref_tx = make_optimizer("adam", 1e-3)
    flat_tx = make_optimizer("adam", 1e-3, flatten=True)
    ref_p, flat_p = params, params
    ref_st, flat_st = ref_tx.init(params), flat_tx.init(params)
    import optax
    for _ in range(3):
        up, ref_st = ref_tx.update(grads, ref_st, ref_p)
        ref_p = optax.apply_updates(ref_p, up)
        up, flat_st = flat_tx.update(grads, flat_st, flat_p)
        flat_p = optax.apply_updates(flat_p, up)
    for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                    jax.tree_util.tree_leaves(flat_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    import pytest
    with pytest.raises(ValueError):
        make_optimizer("adamw", 1e-3, flatten=True,
                       no_decay_mask=no_weight_decay_mask(params))


def test_checkpoint_roundtrip(tmp_path):
    from medical_image_classification_tpu.train.checkpoint import (
        save_checkpoint, restore_checkpoint)
    model, state, imgs, labels = _setup()
    step = make_train_step(model, donate=False)
    state, _ = step(state, imgs, labels, jax.random.PRNGKey(1))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, epoch=3, best_acc=0.75)

    # fresh state, restore into it
    model2, state2, _, _ = _setup()
    restored, epoch, best = restore_checkpoint(ckpt, state2)
    assert epoch == 3 and abs(best - 0.75) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1


def test_kan_grid_update_roundtrip():
    model, state, imgs, labels = _setup("medssd_ekan")
    assert "kan_state" in state.model_state
    old_grid = jax.tree_util.tree_leaves(state.model_state["kan_state"])[0]
    new_state = kan_grid_update(model, state, imgs)
    new_grid = jax.tree_util.tree_leaves(new_state.model_state["kan_state"])[0]
    assert not np.allclose(np.asarray(old_grid), np.asarray(new_grid))
    # training still works after re-gridding
    step = make_train_step(model, donate=False)
    new_state, m = step(new_state, imgs, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


def test_cross_entropy_matches_manual():
    logits = jnp.array([[2.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    labels = jnp.array([0, 1])
    got = cross_entropy_loss(logits, labels)
    want = -np.mean([np.log(np.exp(2) / (np.exp(2) + 1 + np.exp(-1))),
                     np.log(np.exp(1) / (2 + np.exp(1)))])
    np.testing.assert_allclose(float(got), want, rtol=1e-6)
