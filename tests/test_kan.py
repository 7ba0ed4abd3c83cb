"""KAN B-spline math tests + optional torch-reference parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_classification_tpu.ops import kan as kan_ops
from medical_image_classification_tpu.models.kan_modules import (
    KANLinear, OKANLayer,
)


@pytest.mark.parametrize("k", [1, 2, 3])
def test_bspline_partition_of_unity(k):
    grid = kan_ops.make_grid(4, grid_size=5, spline_order=k)
    x = jnp.linspace(-0.99, 0.99, 50)[:, None] * jnp.ones((1, 4))
    bases = kan_ops.b_splines(x, grid, k)
    np.testing.assert_allclose(np.asarray(jnp.sum(bases, -1)), 1.0, atol=1e-5)


def test_curve2coeff_interpolates():
    """Fitting then evaluating must reproduce the target at the fit points."""
    k, gs, in_f, out_f = 3, 5, 3, 2
    grid = kan_ops.make_grid(in_f, gs, k)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (40, in_f), minval=-0.9, maxval=0.9)
    y = jnp.stack([jnp.sin(2 * x), jnp.cos(3 * x)], axis=-1)  # [40, in, out]
    coeff = kan_ops.curve2coeff(x, y, grid, k)
    bases = kan_ops.b_splines(x, grid, k)
    y_hat = jnp.einsum("bic,oic->bio", bases, coeff)
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y), atol=5e-2)


def test_kan_linear_module_shapes_and_grad():
    m = KANLinear(7, grid_size=5, spline_order=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 5))
    vars_ = m.init(jax.random.PRNGKey(2), x)
    y = m.apply(vars_, x)
    assert y.shape == (4, 7)
    g = jax.grad(lambda p: jnp.sum(m.apply({**vars_, "params": p}, x) ** 2))(
        vars_["params"])
    assert jnp.all(jnp.isfinite(g["base_weight"]))
    assert jnp.any(g["spline_weight"] != 0)


def test_kan_update_grid_preserves_function():
    m = KANLinear(3, grid_size=5, spline_order=3)
    x = jax.random.normal(jax.random.PRNGKey(3), (256, 4)) * 0.5
    vars_ = m.init(jax.random.PRNGKey(4), x)
    y_before = m.apply(vars_, x)
    y_after, updated = m.apply(vars_, x, update_grid=True,
                               mutable=["kan_state", "params"])
    merged = {"params": {**vars_["params"], **updated["params"]},
              "kan_state": updated["kan_state"]}
    y_new = m.apply(merged, x)
    # re-gridding re-fits coefficients to approximately preserve the learned
    # function (the new knots can't represent the old spline exactly)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_before),
                               atol=2e-2)
    assert not np.allclose(np.asarray(updated["kan_state"]["grid"]),
                           np.asarray(vars_["kan_state"]["grid"]))


def test_okan_layer_forward_and_acts():
    m = OKANLayer(5, num=5, k=3)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 3))
    vars_ = m.init(jax.random.PRNGKey(6), x)
    y = m.apply(vars_, x)
    assert y.shape == (8, 5)
    y2, pre, post, postsp = m.apply(vars_, x, return_acts=True)
    assert pre.shape == (8, 5, 3) and post.shape == (8, 5, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5)
    # y == sum of postacts over inputs
    np.testing.assert_allclose(np.asarray(jnp.sum(post, axis=-1)),
                               np.asarray(y), rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_bspline_parity_with_reference_ekan():
    """Golden check of the B-spline basis against the reference's torch
    implementation (numerics only — no code shared)."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/kanSSD")
    try:
        from e_kan2 import eKANLinear  # spline_order=3 variant
    except Exception:
        pytest.skip("reference e_kan2 unimportable")
    finally:
        sys.path.pop(0)
    layer = eKANLinear(6, 4)
    x_np = np.random.RandomState(0).uniform(-0.9, 0.9, (10, 6)).astype(np.float32)
    ref = layer.b_splines(torch.from_numpy(x_np)).numpy()
    grid = jnp.asarray(layer.grid.numpy())
    ours = kan_ops.b_splines(jnp.asarray(x_np), grid, layer.spline_order)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_okan_refine_grid_preserves_function():
    """Finer grid must reproduce the parent layer's function."""
    k, num, in_dim, out = 3, 5, 3, 2
    g0 = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, num + 1), (in_dim, num + 1))
    grid = kan_ops.extend_grid(g0, k)
    coef = 0.3 * jax.random.normal(jax.random.PRNGKey(0),
                                   (in_dim, out, num + k))
    new_grid, new_coef = kan_ops.okan_refine_grid(grid, coef, new_num=10, k=k)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, in_dim),
                           minval=-0.9, maxval=0.9)
    y_old = kan_ops.coef2curve(x, grid, coef, k)
    y_new = kan_ops.coef2curve(x, new_grid, new_coef, k)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_old),
                               atol=5e-3)
