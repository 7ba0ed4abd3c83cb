"""DP / TP sharding tests on the 8-device virtual CPU mesh.

The reference has zero distributed tests (SURVEY §4); these make DDP/TP
parity hermetic: a GSPMD-sharded train step must match the single-device
step bit-for-bit (up to reduction order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from medical_image_classification_tpu.models import create_model
from medical_image_classification_tpu.parallel.mesh import (
    make_mesh, batch_sharding,
)
from medical_image_classification_tpu.parallel.sharding import (
    param_shardings, shard_state, state_shardings,
)
from medical_image_classification_tpu.train.train_state import (
    init_train_state, make_train_step,
)
from medical_image_classification_tpu.train.optim import make_optimizer

SMALL = dict(depths=(1, 1), dims=(16, 32), drop_path_rate=0.0, ssd_headdim=8,
             d_state=4)


def _setup(name="medmamba", batch=8):
    model = create_model(name, num_classes=4, **SMALL)
    tx = make_optimizer("adam", 1e-3)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (batch, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(batch, dtype=np.int32) % 4)
    state = init_train_state(model, rng, imgs, tx)
    return model, state, imgs, labels


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_dp_matches_single_device():
    model, state, imgs, labels = _setup()
    step = make_train_step(model, donate=False)
    s1, m1 = step(state, imgs, labels, jax.random.PRNGKey(1))

    mesh = make_mesh(tp=1)
    state_sh = shard_state(state, mesh)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    labels_sh = jax.device_put(labels, batch_sharding(mesh))
    s2, m2 = step(state_sh, imgs_sh, labels_sh, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # Adam normalizes by sqrt(v): reduction-order noise on tiny grads is
    # amplified in relative terms, so compare with an absolute tolerance.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=2e-4)


def test_tp_matches_single_device():
    model, state, imgs, labels = _setup()
    step = make_train_step(model, donate=False)
    s1, m1 = step(state, imgs, labels, jax.random.PRNGKey(1))

    mesh = make_mesh(tp=2)                    # 4-way DP x 2-way TP
    state_sh = shard_state(state, mesh)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    labels_sh = jax.device_put(labels, batch_sharding(mesh))
    s2, m2 = step(state_sh, imgs_sh, labels_sh, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # Adam normalizes by sqrt(v): reduction-order noise on tiny grads is
    # amplified in relative terms, so compare with an absolute tolerance.
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=2e-4)


def test_tp_param_specs_cover_ss2d():
    model, state, imgs, labels = _setup()
    mesh = make_mesh(tp=2)
    specs = param_shardings(state.params, mesh)
    att = specs["layers_0"]["blocks_0"]["self_attention"]
    assert att["in_proj"]["kernel"].spec == P(None, "model")
    assert att["out_proj"]["kernel"].spec == P("model", None)
    assert att["A_logs"].spec == P(None, "model", None)
    # params actually get distributed
    sharded = shard_state(state, mesh)
    k = sharded.params["layers_0"]["blocks_0"]["self_attention"]["in_proj"]["kernel"]
    assert not k.sharding.is_fully_replicated


def test_ssd_core_tp_runs():
    model, state, imgs, labels = _setup("medssd")
    step = make_train_step(model, donate=False)
    mesh = make_mesh(tp=2)
    state_sh = shard_state(state, mesh)
    imgs_sh = jax.device_put(imgs, batch_sharding(mesh))
    labels_sh = jax.device_put(labels, batch_sharding(mesh))
    s2, m2 = step(state_sh, imgs_sh, labels_sh, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
