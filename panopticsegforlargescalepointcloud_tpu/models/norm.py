"""Masked normalization layers for padded sparse tensors.

The reference uses ``ME.MinkowskiBatchNorm`` (plain BN over all voxel rows,
``/root/reference/torch_points3d/modules/MinkowskiEngine/api_modules.py:40``)
and a BN-momentum decay scheduler that mutates module momentum in place
(``core/schedulers/bn_schedulers.py``). Here BN must ignore padding rows, so
statistics are computed over the valid mask; momentum is a *call argument* so
the scheduler is just a value in the train state (functionally pure).

Convention: `momentum` follows torch (new = (1-m)*running + m*batch), because
the reference's BN scheduler config speaks torch momentum values.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.winconv import Packed


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid rows of a padded [N, C] voxel feature tensor.

    Padding rows are zeroed on output (beta would otherwise leak into them).
    Statistics are fp32 regardless of input dtype.

    Also accepts a lane-packed activation (ops/winconv.Packed, [n/p, p*c]):
    statistics fold the p voxel slots per row back to per-channel sums and
    the affine applies with p-tiled parameter vectors, so the normalization
    never leaves the packed layout (no (8,128) tile-padding HBM traffic).
    Same math; only the fp32 summation order of the batch statistics differs.
    """

    epsilon: float = 1e-5
    sync_axis: str | None = None  # e.g. "data" for cross-device sync BN

    @nn.compact
    def __call__(
        self,
        x: "jnp.ndarray | Packed",
        mask: jnp.ndarray,
        train: bool,
        momentum: jnp.ndarray | float = 0.1,
    ) -> "jnp.ndarray | Packed":
        packed = isinstance(x, Packed)
        c = x.c if packed else x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if packed:
            p = x.p
            lanes = x.data.shape[1]
            # per-lane validity: voxel slot s of packed row i is mask[i*p+s]
            m = mask.reshape(-1, p, 1).astype(jnp.float32)  # [n/p, p, 1]
            m = jnp.broadcast_to(m, (x.data.shape[0], p, c)).reshape(-1, p * c)
            if lanes != p * c:
                m = jnp.pad(m, ((0, 0), (0, lanes - p * c)))

            def tile(v):  # [c] -> [lanes], pad lanes 0
                t = jnp.tile(v, p)
                return jnp.pad(t, (0, lanes - p * c)) if lanes != p * c else t

            def fold(s):  # [lanes] lane-sums -> [c] channel sums
                return s[: p * c].reshape(p, c).sum(axis=0)

        else:
            m = mask.astype(jnp.float32)[:, None]
            tile = fold = lambda v: v
        data = x.data if packed else x
        xf = data.astype(jnp.float32) * m
        if train:
            cnt = jnp.sum(mask.astype(jnp.float32))
            sx = fold(jnp.sum(xf, axis=0))
            sxx = fold(jnp.sum(xf * xf, axis=0))
            if self.sync_axis is not None:
                import jax

                cnt = jax.lax.psum(cnt, self.sync_axis)
                sx = jax.lax.psum(sx, self.sync_axis)
                sxx = jax.lax.psum(sxx, self.sync_axis)
            cnt = jnp.maximum(cnt, 1.0)
            mean = sx / cnt
            var = jnp.maximum(sxx / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                mom = jnp.asarray(momentum, jnp.float32)
                # torch BatchNorm stores the UNBIASED (n/(n-1)) variance in
                # running_var while normalizing with the biased one; match
                # that so imported reference checkpoints and our own
                # eval-mode stats agree (ADVICE r1 low).
                unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
                ra_mean.value = (1.0 - mom) * ra_mean.value + mom * mean
                ra_var.value = (1.0 - mom) * ra_var.value + mom * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (data.astype(jnp.float32) - tile(mean)) * tile(
            jax_rsqrt(var + self.epsilon)
        )
        y = y * tile(scale) + tile(bias)
        y = (y * m).astype(data.dtype)
        return x.replace(data=y) if packed else y


def jax_rsqrt(v: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.rsqrt(v)
