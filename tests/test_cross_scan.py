"""Inverse-property tests for cross-scan / efficient-scan."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_classification_tpu.ops import (
    cross_scan, cross_merge, cross_merge_stack,
    cross_scan_time_major, cross_merge_time_major,
    cross_merge_stack_time_major,
    efficient_scan, efficient_merge,
)


def test_cross_scan_shapes_and_directions():
    x = jnp.arange(2 * 3 * 4 * 5, dtype=jnp.float32).reshape(2, 3, 4, 5)
    xs = cross_scan(x)
    assert xs.shape == (2, 4, 12, 5)
    # dir0 row-major
    np.testing.assert_array_equal(np.asarray(xs[0, 0, 1]), np.asarray(x[0, 0, 1]))
    # dir1 column-major: element 1 is x[1, 0]
    np.testing.assert_array_equal(np.asarray(xs[0, 1, 1]), np.asarray(x[0, 1, 0]))
    # dir2 is dir0 reversed
    np.testing.assert_array_equal(np.asarray(xs[:, 2]),
                                  np.asarray(jnp.flip(xs[:, 0], axis=1)))


def test_cross_merge_inverts_scan():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 7, 5, 6))
    xs = cross_scan(x)
    merged = cross_merge(xs, 7, 5)
    # each direction inverts back to x, so merge == 4x
    np.testing.assert_allclose(np.asarray(merged), 4 * np.asarray(x), rtol=1e-6)
    stacked = cross_merge_stack(xs, 7, 5)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(stacked[:, k]),
                                   np.asarray(x.reshape(2, 35, 6)), rtol=1e-6)


def test_efficient_scan_roundtrip():
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 8, 6, 4))
    ys = efficient_scan(x, step=2)
    assert ys.shape == (2, 4, 12, 4)
    back = efficient_merge(ys, 8, 6, step=2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_cross_scan_time_major_matches_cross_scan():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 6, 5, 3))
    xs = cross_scan(x)                       # [B, 4, L, C]
    xt = cross_scan_time_major(x)            # [B, L, 4, C]
    np.testing.assert_array_equal(np.asarray(jnp.swapaxes(xt, 1, 2)),
                                  np.asarray(xs))


def test_cross_merge_time_major_inverts_scan():
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 7, 5, 6))
    xt = cross_scan_time_major(x)
    merged = cross_merge_time_major(xt, 7, 5)
    np.testing.assert_allclose(np.asarray(merged), 4 * np.asarray(x),
                               rtol=1e-6)
    stacked = cross_merge_stack_time_major(xt, 7, 5)
    for k in range(4):
        np.testing.assert_allclose(np.asarray(stacked[:, k]),
                                   np.asarray(x.reshape(2, 35, 6)),
                                   rtol=1e-6)


def test_cross_scan_grad_flows():
    x = jnp.ones((1, 4, 4, 2))
    g = jax.grad(lambda v: jnp.sum(cross_merge(cross_scan(v), 4, 4)))(x)
    np.testing.assert_allclose(np.asarray(g), 4.0 * np.ones_like(np.asarray(g)))


def test_noflip_merge_matches_flip_merge():
    """cross_merge_noflip_time_major(d0-aligned ys) == cross_merge_time_major
    (kernel-layout ys): the flip-free fused path emits directions 2/3
    already in d0/d1 order, so pre-flipping them must reproduce the
    original merge exactly."""
    from medical_image_classification_tpu.ops.cross_scan import (
        cross_merge_noflip_time_major,
        cross_merge_time_major,
    )
    rng = np.random.RandomState(0)
    H = W = 4
    ys = jnp.asarray(rng.randn(2, H * W, 4, 3), jnp.float32)
    want = cross_merge_time_major(ys, H, W)
    ys_aligned = jnp.stack(
        [ys[:, :, 0], ys[:, :, 1],
         jnp.flip(ys[:, :, 2], axis=1), jnp.flip(ys[:, :, 3], axis=1)],
        axis=2)
    got = cross_merge_noflip_time_major(ys_aligned, H, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_time_major2_is_first_half_of_time_major():
    from medical_image_classification_tpu.ops.cross_scan import (
        cross_scan_time_major,
        cross_scan_time_major2,
    )
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 6, 3), jnp.float32)
    full = cross_scan_time_major(x)
    half = cross_scan_time_major2(x)
    np.testing.assert_allclose(np.asarray(half),
                               np.asarray(full[:, :, :2]), rtol=0, atol=0)
    # and directions 2/3 are exactly the flips of the half
    np.testing.assert_allclose(
        np.asarray(jnp.flip(half, axis=1)), np.asarray(full[:, :, 2:]),
        rtol=0, atol=0)


def test_scan_order_stack_equiv_through_stl_reduce():
    """cross_stack_scan_order skips alignment; an STL-style reduction
    (per-position gate -> row softmax -> sum_l outer(A_l, V_l)) must give
    the same tokens per direction as the aligned stack, because every
    per-direction sequence holds the same multiset of rows."""
    from medical_image_classification_tpu.ops.cross_scan import (
        cross_merge_stack_time_major,
        cross_stack_scan_order,
    )
    rng = np.random.RandomState(7)
    H, W, C, P = 4, 6, 8, 5
    L = H * W
    ys = jnp.asarray(rng.randn(2, L, 4, C), jnp.float32)
    u1 = jnp.asarray(rng.randn(C, P), jnp.float32)
    u2 = jnp.asarray(rng.randn(C, C), jnp.float32)

    def stl_like(stack):                      # [B, 4, L, C] -> [B, 4, P, C]
        w = stack * jax.nn.sigmoid(jnp.mean(stack, -1, keepdims=True))
        A = jax.nn.softmax(w @ u1, axis=-1)
        return jnp.einsum("bklp,bklc->bkpc", A, w @ u2)

    aligned = stl_like(cross_merge_stack_time_major(ys, H, W))
    scan_order = stl_like(cross_stack_scan_order(ys))
    np.testing.assert_allclose(np.asarray(scan_order), np.asarray(aligned),
                               rtol=1e-5, atol=1e-5)


def test_split_channels_matches_plain_slices():
    """split_channels (one-concat vjp) must be value- and grad-identical
    to plain trailing-axis slices."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from medical_image_classification_tpu.ops.cross_scan import (
        split_channels)

    x = jnp.asarray(np.random.RandomState(0).randn(3, 7, 12), jnp.float32)
    sizes = (4, 1, 5, 2)

    def f(x):
        a, b, c, d = split_channels(x, sizes)
        return (jnp.sum(jnp.tanh(a)) + 2 * jnp.sum(b) + jnp.sum(c * c)
                + jnp.sum(jnp.abs(d)))

    def g(x):
        a, b, c, d = x[..., :4], x[..., 4:5], x[..., 5:10], x[..., 10:]
        return (jnp.sum(jnp.tanh(a)) + 2 * jnp.sum(b) + jnp.sum(c * c)
                + jnp.sum(jnp.abs(d)))

    np.testing.assert_allclose(float(f(x)), float(g(x)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                               np.asarray(jax.grad(g)(x)), rtol=1e-6)
    # bf16 path keeps the input dtype through the concat
    xb = x.astype(jnp.bfloat16)
    gb = jax.grad(lambda t: f(t).astype(jnp.float32))(xb)
    assert gb.dtype == jnp.bfloat16
