"""Thin-plate-spline surface evaluation and sampling-grid generation.

JAX re-derivation of the TPS math used by WarpingNet (reference
``pytorch_tps.py:29-217``, itself derived from Christoph Heindl's
py-thin-plate-spline, MIT). Supports the reduced-form theta
(T+2 params, ref ``pytorch_tps.py:67-69``) the reference trains with,
plus the 1-D depth variants and ``uniform_grid`` control-point layout.

All heavy math is batched matmuls (``einsum``) → MXU-friendly.
Grids are [N, H, W, 2] with (x, y) channels, consistent with
``spaa_tpu.ops.image.grid_sample``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_grid(shape) -> jax.Array:
    """[H, W, 2] control points uniformly spanning [0, 1]^2.
    Ref ``pytorch_tps.py:201-217``; channel order (x, y)."""
    h, w = int(shape[0]), int(shape[1])
    xs = jnp.linspace(0.0, 1.0, w)
    ys = jnp.linspace(0.0, 1.0, h)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def _tps_radial(grid_xy: jax.Array, ctrl: jax.Array) -> jax.Array:
    """U matrix of radial basis values: U = D^2 * log(D + 1e-6).

    grid_xy: [N, H, W, 2]; ctrl: [N, T, 2] -> returns [N, H, W, T].
    """
    diff = grid_xy[:, :, :, None, :] - ctrl[:, None, None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return (d * d) * jnp.log(d + 1e-6)


def _expand_theta(theta: jax.Array, num_ctrl: int) -> jax.Array:
    """Reduced-form support: theta [N, T+2, C] -> full [N, T+3, C] with the
    extra radial weight being minus the sum of the others
    (ref ``pytorch_tps.py:67-69``)."""
    if theta.shape[1] == num_ctrl + 2:
        w = theta[:, :-3, :]
        w = jnp.concatenate([-jnp.sum(w, axis=1, keepdims=True), w], axis=1)
        return jnp.concatenate([w, theta[:, -3:, :]], axis=1)
    return theta


def tps(theta: jax.Array, ctrl: jax.Array, grid: jax.Array) -> jax.Array:
    """Evaluate the TPS surface (2 output channels: dx, dy).

    theta: [N, T+3, 2] or reduced [N, T+2, 2]
    ctrl:  [T, 2] or [N, T, 2] in [0, 1] coords
    grid:  [N, H, W, 3] with homogeneous 1 in channel 0 then (x, y)
    Returns [N, H, W, 2]. Ref ``pytorch_tps.py:29-76``.
    """
    n = grid.shape[0]
    if ctrl.ndim == 2:
        ctrl = jnp.broadcast_to(ctrl, (n,) + ctrl.shape)
    t = ctrl.shape[1]
    theta = _expand_theta(theta, t)

    u = _tps_radial(grid[..., 1:], ctrl)                      # [N,H,W,T]
    w, a = theta[:, :-3, :], theta[:, -3:, :]
    b = jnp.einsum("nhwt,ntc->nhwc", u, w,
                   precision=jax.lax.Precision.HIGHEST)
    z = jnp.einsum("nhwj,njc->nhwc", grid, a,
                   precision=jax.lax.Precision.HIGHEST) + b
    return z


def _homogeneous_grid(n: int, h: int, w: int) -> jax.Array:
    """[N, H, W, 3] grid of (1, x, y) with x, y in [0, 1]."""
    xs = jnp.linspace(0.0, 1.0, w)
    ys = jnp.linspace(0.0, 1.0, h)
    gx, gy = jnp.meshgrid(xs, ys)
    g = jnp.stack([jnp.ones_like(gx), gx, gy], axis=-1)
    return jnp.broadcast_to(g, (n, h, w, 3))


def tps_grid(theta: jax.Array, ctrl: jax.Array, size) -> jax.Array:
    """Sampling grid in [-1, 1] for ``grid_sample``.

    size: (N, C, H, W) tuple for reference-signature parity (C unused) or
    (N, H, W). Ref ``pytorch_tps.py:79-106``.
    """
    if len(size) == 4:
        n, _, h, w = size
    else:
        n, h, w = size
    g = _homogeneous_grid(int(n), int(h), int(w))
    z = tps(theta, ctrl, g)
    return (g[..., 1:] + z) * 2.0 - 1.0


def tps_d(theta: jax.Array, ctrl: jax.Array, grid: jax.Array) -> jax.Array:
    """1-D output TPS (depth approximation): theta [N, T+3, 1] (or reduced
    [N, T+2, 1]) → z [N, H, W, 1]. Ref ``pytorch_tps.py:109-157``.

    The reference implements this as a separate function because its 2-D
    ``tps`` hardcodes two output channels; here :func:`tps` is generic over
    the trailing channel dim (the einsum contracts ``c`` of any size), so
    the 1-D math IS the shared core evaluated with C=1 — verified against
    a direct transcription of the reference formula in
    ``tests/test_tps.py::test_tps_d_matches_reference_formula``."""
    return tps(theta, ctrl, grid)


def tps_depth(theta: jax.Array, ctrl: jax.Array, size) -> jax.Array:
    """TPS depth map [N, H, W, 1] on the uniform homogeneous grid
    (C=1 case of the generic core, see :func:`tps_d`).
    Ref ``pytorch_tps.py:160-186``."""
    if len(size) == 4:
        n, _, h, w = size
    else:
        n, h, w = size
    g = _homogeneous_grid(int(n), int(h), int(w))
    return tps_d(theta, ctrl, g)


def tps_sparse(theta: jax.Array, ctrl: jax.Array, xy: jax.Array) -> jax.Array:
    """Evaluate TPS displacement at sparse xy points [N, M, 2] (or [M, 2]).
    Ref ``pytorch_tps.py:188-198``."""
    if xy.ndim == 2:
        xy = jnp.broadcast_to(xy, (theta.shape[0],) + xy.shape)
    n, m = xy.shape[:2]
    grid = jnp.concatenate([jnp.ones((n, m, 1), xy.dtype), xy], axis=-1)
    z = tps(theta, ctrl, grid.reshape(n, m, 1, 3))
    return xy + z.reshape(n, m, 2)
