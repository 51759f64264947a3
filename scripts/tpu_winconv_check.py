"""Real-TPU exactness + compile check for the windowed Pallas conv.

Runs the packed-in/packed-out forward AND backward (the two Mosaic-sensitive
in-kernel lane regroups, ops/winconv.py _pack_rows/_unpack_rows) on the live
chip against the row-gather conv oracle, at the widths the paper backbone
uses (16/32/64). The round-4 driver bench died on a Mosaic `tpu.reshape
(256,16)->(32,128)` shape cast; this script is the fast canary that the
replacement lowering compiles and is numerically right on the real backend.

Usage: timeout 600 python scripts/tpu_winconv_check.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv
from panopticsegforlargescalepointcloud_tpu.ops.sparse import (
    KERNEL_OFFSETS_K3,
    make_grid,
    same_level_map,
)
from panopticsegforlargescalepointcloud_tpu.ops.winconv import (
    Packed,
    make_windowed,
    pack_feats,
    unpack_feats,
    windowed_conv,
)


def rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))


def main():
    rng = np.random.default_rng(7)
    n = 8192
    pts = (rng.normal(size=(4 * n, 3)) * np.array([20, 20, 5])).astype(np.int32)
    uniq = np.unique(pts, axis=0)[: n - 128]
    coords = np.zeros((n, 3), np.int32)
    coords[: len(uniq)] = uniq
    mask = np.zeros(n, bool)
    mask[: len(uniq)] = True
    grid, _ = jax.jit(make_grid)(
        jnp.zeros(n, jnp.int32), jnp.asarray(coords), jnp.asarray(mask)
    )
    nbr = jax.jit(lambda g: same_level_map(g, KERNEL_OFFSETS_K3))(grid)
    wm = jax.jit(lambda: make_windowed(nbr, n, tr=256, w=512, u=2048))()
    ov = int(wm.overflow)
    print(f"map built: overflow={ov}")

    ok = True
    for cin, cout in [(16, 16), (16, 32), (32, 16), (64, 64), (32, 64)]:
        feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.2, jnp.float32)

        def ref_loss(f, w):
            o = sparse_conv(
                f.astype(jnp.bfloat16), nbr, w.astype(jnp.bfloat16),
                mode="fused", out_dtype=jnp.float32, nbr_idx_t=nbr,
            )
            return jnp.sum(o * o), o

        def win_loss(f, w):
            fp = pack_feats(f.astype(jnp.bfloat16))
            o = windowed_conv(fp, wm, w.astype(jnp.bfloat16), wm,
                              out_packed=True)
            ou = unpack_feats(o)
            return jnp.sum(ou * ou), ou

        (lr, orf), (gr_f, gr_w) = jax.jit(
            lambda f, w: (ref_loss(f, w)[:2], jax.grad(
                lambda a, b: ref_loss(a, b)[0], argnums=(0, 1))(f, w))
        )(feats, w)
        (lw, owf), (gw_f, gw_w) = jax.jit(
            lambda f, w: (win_loss(f, w)[:2], jax.grad(
                lambda a, b: win_loss(a, b)[0], argnums=(0, 1))(f, w))
        )(feats, w)
        e_out = rel_err(orf, owf)
        e_gf = rel_err(gr_f, gw_f)
        e_gw = rel_err(gr_w, gw_w)
        line_ok = e_out < 2e-2 and e_gf < 3e-2 and e_gw < 3e-2
        ok &= line_ok
        print(
            f"C {cin:3d}->{cout:3d}: out {e_out:.2e} dX {e_gf:.2e} "
            f"dW {e_gw:.2e} {'OK' if line_ok else 'FAIL'}"
        )
    print("ALL OK" if ok else "FAILURES")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
