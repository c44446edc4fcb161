"""Property tests for the TPS module (reference ``pytorch_tps.py``)."""

import numpy as np
import jax.numpy as jnp

from spaa_tpu.ops import tps_grid, tps_sparse, uniform_grid


def test_uniform_grid_layout():
    g = np.asarray(uniform_grid((3, 4)))
    assert g.shape == (3, 4, 2)
    np.testing.assert_allclose(g[0, :, 0], np.linspace(0, 1, 4), atol=1e-7)
    np.testing.assert_allclose(g[:, 0, 1], np.linspace(0, 1, 3), atol=1e-7)
    np.testing.assert_allclose(g[0, 0], [0, 0])
    np.testing.assert_allclose(g[-1, -1], [1, 1])


def test_tps_grid_zero_theta_is_identity():
    """theta = 0 (full form) gives displacement 0 → grid spans [-1,1]."""
    ctrl = uniform_grid((4, 4)).reshape(-1, 2)
    theta = jnp.zeros((1, 16 + 3, 2))
    g = np.asarray(tps_grid(theta, ctrl, (1, 3, 6, 5)))
    assert g.shape == (1, 6, 5, 2)
    np.testing.assert_allclose(g[0, :, :, 0],
                               np.tile(np.linspace(-1, 1, 5), (6, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(g[0, :, :, 1],
                               np.tile(np.linspace(-1, 1, 6)[:, None], (1, 5)),
                               atol=1e-6)


def test_tps_grid_reduced_form_matches_full():
    """Reduced theta (T+2) equals full theta (T+3) whose radial weights
    sum to zero (ref pytorch_tps.py:67-69)."""
    rng = np.random.default_rng(1)
    ctrl = uniform_grid((3, 3)).reshape(-1, 2)
    t = 9
    w_free = rng.normal(size=(1, t - 1, 2)).astype(np.float32) * 0.01
    a = rng.normal(size=(1, 3, 2)).astype(np.float32) * 0.01
    reduced = jnp.asarray(np.concatenate([w_free, a], axis=1))       # T+2
    w_full = np.concatenate([-w_free.sum(1, keepdims=True), w_free], 1)
    full = jnp.asarray(np.concatenate([w_full, a], axis=1))          # T+3

    g1 = np.asarray(tps_grid(reduced, ctrl, (1, 3, 8, 8)))
    g2 = np.asarray(tps_grid(full, ctrl, (1, 3, 8, 8)))
    np.testing.assert_allclose(g1, g2, atol=1e-6)


def test_tps_affine_only():
    """With radial weights zero, TPS reduces to the affine part:
    z = a0 + a1*x + a2*y per output channel."""
    ctrl = uniform_grid((2, 2)).reshape(-1, 2)
    a = np.array([[[0.1, -0.2], [0.3, 0.0], [0.0, 0.4]]], np.float32)
    theta = jnp.asarray(np.concatenate([np.zeros((1, 4, 2), np.float32), a], 1))
    g = np.asarray(tps_grid(theta, ctrl, (1, 3, 4, 4)))
    xs = np.linspace(0, 1, 4)
    ys = np.linspace(0, 1, 4)
    gx, gy = np.meshgrid(xs, ys)
    zx = 0.1 + 0.3 * gx + 0.0 * gy
    zy = -0.2 + 0.0 * gx + 0.4 * gy
    np.testing.assert_allclose(g[0, ..., 0], (gx + zx) * 2 - 1, atol=1e-5)
    np.testing.assert_allclose(g[0, ..., 1], (gy + zy) * 2 - 1, atol=1e-5)


def test_tps_sparse_shape():
    ctrl = uniform_grid((3, 3)).reshape(-1, 2)
    theta = jnp.full((2, 9 + 2, 2), 1e-3)
    xy = jnp.asarray(np.random.default_rng(0).random((5, 2)), jnp.float32)
    out = tps_sparse(theta, ctrl, xy)
    assert out.shape == (2, 5, 2)
    assert np.isfinite(np.asarray(out)).all()


def _tps_formula_np(theta, ctrl, grid):
    """Direct numpy transcription of the reference TPS evaluation
    (pytorch_tps.py:29-76 / the 1-D variant :109-157):
    z = a0 + a1*x + a2*y + sum_t w_t * D_t^2 log(D_t + 1e-6)."""
    n, h, w_, _ = grid.shape
    t = ctrl.shape[-2]
    if theta.shape[1] == t + 2:  # reduced form
        ww = theta[:, :-3]
        ww = np.concatenate([-ww.sum(axis=1, keepdims=True), ww], axis=1)
        theta = np.concatenate([ww, theta[:, -3:]], axis=1)
    out = np.zeros((n, h, w_, theta.shape[-1]), np.float64)
    for b in range(n):
        for i in range(h):
            for j in range(w_):
                x, y = grid[b, i, j, 1], grid[b, i, j, 2]
                d = np.sqrt(((np.array([x, y]) - ctrl) ** 2).sum(-1))
                u = d * d * np.log(d + 1e-6)
                z = (u[:, None] * theta[b, :-3]).sum(0)
                z = z + grid[b, i, j] @ theta[b, -3:]
                out[b, i, j] = z
    return out


def test_tps_d_matches_reference_formula():
    """The 1-D depth variant (theta C=1) through the channel-generic core
    must equal the reference tps_d formula (pytorch_tps.py:109-157),
    both full and reduced theta forms."""
    from spaa_tpu.ops.tps import tps_d, tps_depth
    rng = np.random.default_rng(5)
    ctrl = np.asarray(uniform_grid((3, 3))).reshape(-1, 2)
    g = np.concatenate(
        [np.ones((2, 4, 5, 1)), rng.random((2, 4, 5, 2))], -1
    ).astype(np.float32)

    for t_params in (9 + 3, 9 + 2):  # full and reduced
        theta = (0.1 * rng.standard_normal((2, t_params, 1))).astype(np.float32)
        ours = np.asarray(tps_d(jnp.asarray(theta), jnp.asarray(ctrl),
                                jnp.asarray(g)))
        ref = _tps_formula_np(theta.astype(np.float64),
                              ctrl.astype(np.float64),
                              g.astype(np.float64))
        assert ours.shape == (2, 4, 5, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    depth = np.asarray(tps_depth(jnp.full((1, 9 + 3, 1), 1e-2),
                                 jnp.asarray(ctrl), (1, 3, 4, 5)))
    assert depth.shape == (1, 4, 5, 1)
    assert np.isfinite(depth).all()


def test_tps_2d_matches_reference_formula():
    """The 2-D surface through the same core vs the transcribed formula."""
    from spaa_tpu.ops.tps import tps
    rng = np.random.default_rng(6)
    ctrl = np.asarray(uniform_grid((2, 3))).reshape(-1, 2)
    g = np.concatenate(
        [np.ones((1, 3, 4, 1)), rng.random((1, 3, 4, 2))], -1
    ).astype(np.float32)
    theta = (0.1 * rng.standard_normal((1, 6 + 3, 2))).astype(np.float32)
    ours = np.asarray(tps(jnp.asarray(theta), jnp.asarray(ctrl),
                          jnp.asarray(g)))
    ref = _tps_formula_np(theta.astype(np.float64), ctrl.astype(np.float64),
                          g.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
