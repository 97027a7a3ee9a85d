"""Kernel Point Convolution stem (flax.linen).

Re-implements the semantics of ``torch_points3d``'s ``KPConvLayer`` as used by
the reference stem (``model/stratified_transformer.py:344-392``):
15 kernel points in a ball of radius ``1.5 * point_influence``, linear
influence ``max(0, 1 - |x_n - x_q - k_p| / point_influence)``, "sum"
aggregation, one ``(in, out)`` weight matrix per kernel point.

Kernel point dispositions are generated here by a deterministic repulsion
optimisation (one fixed center point, the rest mutually repelling inside the
ball) — the same construction KPConv's ``kernel_points.py`` performs, derived
independently. Exact dispositions differ from the reference's cached ones;
the layer semantics and capacity are identical.

``KPConvSimpleBlock`` / ``KPConvResBlock`` mirror reference :344-392
(LeakyReLU(0.2), FastBatchNorm1d(momentum=0.02) -> `MaskedBatchNorm`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from stratified_transformer_tpu.models.layers import MaskedBatchNorm, dense

_INFLUENCE_TO_RADIUS = 1.5


def generate_kernel_points(radius, num_points=15, seed=0, iters=300):
    """Deterministic repulsion layout of kernel points in a ball.

    Point 0 is fixed at the origin ("fixed=center" in KPConv); the others
    repel each other (inverse-square) and are softly attracted inward, then
    the layout is scaled so the mean radius is ~0.66 * radius (KPConv keeps
    points well inside the ball).
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(num_points, 3))
    pts[0] = 0.0
    pts /= max(np.abs(pts).max(), 1e-6)
    step = 0.01
    for _ in range(iters):
        diff = pts[:, None, :] - pts[None, :, :]
        d = np.linalg.norm(diff, axis=-1) + 1e-6
        np.fill_diagonal(d, np.inf)
        force = (diff / d[..., None] ** 3).sum(1)
        # soft centering force keeps the cloud bounded
        force -= 0.5 * pts * (np.linalg.norm(pts, axis=-1, keepdims=True))
        pts[1:] += step * np.clip(force[1:], -1.0, 1.0)
        r = np.linalg.norm(pts[1:], axis=-1, keepdims=True)
        pts[1:] = np.where(r > 1.0, pts[1:] / r, pts[1:])
    # normalise mean shell radius to 0.66 and scale to the kernel radius
    shell = np.linalg.norm(pts[1:], axis=-1).mean()
    pts = pts / max(shell, 1e-6) * 0.66
    return (pts * radius).astype(np.float32)


class KPConv(nn.Module):
    out_channels: int
    point_influence: float
    num_kernel_points: int = 15

    @nn.compact
    def __call__(self, feats, xyz, neighbor_idx, neighbor_mask):
        """feats ``[N, C]``, xyz ``[N, 3]``, neighbor_idx ``[N, K]`` (into the
        same point set), neighbor_mask ``[N, K]`` bool."""
        n, c = feats.shape
        p = self.num_kernel_points
        kernel_pts = jnp.asarray(generate_kernel_points(
            _INFLUENCE_TO_RADIUS * self.point_influence, p))

        w = self.param(
            "kernel_weights",
            nn.initializers.he_uniform(),
            (p, c, self.out_channels), jnp.float32,
        )
        diff = xyz[neighbor_idx] - xyz[:, None, :]              # [N,K,3]
        d = jnp.linalg.norm(
            diff[:, :, None, :] - kernel_pts[None, None, :, :], axis=-1
        )                                                        # [N,K,P]
        infl = jnp.maximum(1.0 - d / self.point_influence, 0.0)
        infl = jnp.where(neighbor_mask[:, :, None], infl, 0.0)
        gathered = jnp.where(
            neighbor_mask[:, :, None], feats[neighbor_idx], 0.0)  # [N,K,C]
        per_kernel = jnp.einsum(
            "nkp,nkc->npc", infl.astype(feats.dtype), gathered,
            preferred_element_type=jnp.float32)
        out = jnp.einsum(
            "npc,pcd->nd", per_kernel, w.astype(feats.dtype),
            preferred_element_type=jnp.float32)
        return out.astype(feats.dtype)


class KPConvSimpleBlock(nn.Module):
    """KPConv -> BN -> LeakyReLU (reference :344-359)."""

    out_channels: int
    point_influence: float
    negative_slope: float = 0.2
    bn_momentum: float = 0.02
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, xyz, neighbor_idx, neighbor_mask, valid, *,
                 training: bool):
        x = KPConv(self.out_channels, self.point_influence, name="kpconv")(
            feats, xyz, neighbor_idx, neighbor_mask)
        x = MaskedBatchNorm(momentum=self.bn_momentum,
                            axis_name=self.bn_axis_name, name="bn")(
            x, valid, training=training)
        return nn.leaky_relu(x, self.negative_slope)


class KPConvResBlock(nn.Module):
    """Bottleneck residual KPConv (reference :362-392)."""

    out_channels: int
    point_influence: float
    negative_slope: float = 0.2
    bn_momentum: float = 0.02
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats, xyz, neighbor_idx, neighbor_mask, valid, *,
                 training: bool):
        c = feats.shape[-1]
        d2 = self.out_channels // 4
        act = lambda t: nn.leaky_relu(t, self.negative_slope)  # noqa: E731

        x = dense(d2, use_bias=False, name="unary1")(feats)
        x = act(MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.bn_axis_name, name="bn1")(
            x, valid, training=training))
        x = KPConv(d2, self.point_influence, name="kpconv")(
            x, xyz, neighbor_idx, neighbor_mask)
        x = dense(self.out_channels, use_bias=False, name="unary2")(x)
        x = act(MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.bn_axis_name, name="bn2")(
            x, valid, training=training))

        if c != self.out_channels:
            sc = dense(self.out_channels, use_bias=False, name="shortcut")(
                feats)
            sc = MaskedBatchNorm(momentum=self.bn_momentum, axis_name=self.bn_axis_name, name="bn_sc")(
                sc, valid, training=training)
        else:
            sc = feats
        return x + sc
