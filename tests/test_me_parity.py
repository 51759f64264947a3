"""ME-convention activation parity (VERDICT r1 missing #5).

MinkowskiEngine itself is not installable here, so the oracle chain is:

  torch Conv3d / ConvTranspose3d on a DENSE grid
      -> re-expressed as an ME-layout kernel array [K, Cin, Cout] using the
         ME HYPER_CUBE enumeration encoded ONCE in
         tools/import_torch_checkpoint.me_kernel_offsets (x-fastest, per
         MinkowskiEngine src/kernel_region.hpp)
      -> imported through the importer's permutation/reversal rules
      -> run through our sparse conv ops on the same grid.

If any link of the chain (ME enumeration, me_to_ours_perm, the transpose-K
reversal, stride-2 coordinate semantics) were wrong, the activations would
disagree. fp32 tolerance 1e-4 per the round-1 verdict's bar.

Reference semantics: ME conv out[u] = sum_k W[k] in[u + off_k * stride]
(forward, correlation not flipped); ConvolutionTranspose writes onto the
cached finer coordinate map with the adjoint connectivity
(torch_points3d/modules/MinkowskiEngine/api_modules.py:235-311 usage).
"""

import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))

from import_torch_checkpoint import (  # noqa: E402
    me_kernel_offsets,
    me_to_ours_perm,
)

import jax.numpy as jnp  # noqa: E402

from panopticsegforlargescalepointcloud_tpu.ops.conv import sparse_conv  # noqa: E402
from panopticsegforlargescalepointcloud_tpu.ops.sparse import (  # noqa: E402
    _kernel_offsets,
    down_map,
    downsample,
    make_grid,
    same_level_map,
    up_map,
)

torch = pytest.importorskip("torch")


def dense_grid(n):
    """All n^3 voxels of [0,n)^3, canonically sorted."""
    xyz = np.stack(
        np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)
    batch = np.zeros(len(xyz), np.int32)
    mask = np.ones(len(xyz), bool)
    grid, inverse = make_grid(jnp.asarray(batch), jnp.asarray(xyz), jnp.asarray(mask))
    return grid, np.asarray(inverse), xyz


def me_kernel_from_torch_conv(wt: np.ndarray) -> np.ndarray:
    """torch Conv3d weight [Cout, Cin, kx, ky, kz] -> ME layout [K, Cin, Cout].

    torch cross-correlation with padding=(k-1)//2: output at p sums
    input[p + (ki - (k-1)//2)] * W[..., ki], so kernel index ki corresponds to
    offset ki - (k-1)//2 per axis; ME enumerates those offsets x-fastest.
    """
    cout, cin, k, _, _ = wt.shape
    offs = me_kernel_offsets(k)
    r = (k - 1) // 2
    w = np.empty((len(offs), cin, cout), wt.dtype)
    for j, o in enumerate(offs):
        w[j] = wt[:, :, o[0] + r, o[1] + r, o[2] + r].T
    return w


def me_transpose_kernel_from_torch(wt: np.ndarray) -> np.ndarray:
    """torch ConvTranspose3d weight [Cin, Cout, kx, ky, kz] -> ME transpose
    layout [K, Cin, Cout].

    torch conv_transpose (stride 2, padding 1): out[f] += in[c] * W[..., ki]
    where ki = f - 2c + 1, i.e. the DOWN offset f - 2c equals ki - 1; ME's
    transpose kernel indexes the same enumerated region by that down offset
    (adjoint of the forward map).
    """
    cin, cout, k, _, _ = wt.shape
    offs = me_kernel_offsets(k)
    r = (k - 1) // 2
    w = np.empty((len(offs), cin, cout), wt.dtype)
    for j, o in enumerate(offs):
        w[j] = wt[:, :, o[0] + r, o[1] + r, o[2] + r]
    return w


class TestEnumeration:
    def test_me_offsets_x_fastest(self):
        offs = me_kernel_offsets(3)
        assert offs.shape == (27, 3)
        # axis 0 cycles fastest
        np.testing.assert_array_equal(offs[0], [-1, -1, -1])
        np.testing.assert_array_equal(offs[1], [0, -1, -1])
        np.testing.assert_array_equal(offs[3], [-1, 0, -1])
        np.testing.assert_array_equal(offs[9], [-1, -1, 0])
        np.testing.assert_array_equal(offs[26], [1, 1, 1])

    def test_perm_is_base3_digit_reversal(self):
        perm = me_to_ours_perm(3)
        ours = _kernel_offsets(3)
        me = me_kernel_offsets(3)
        for k in range(27):
            np.testing.assert_array_equal(me[perm[k]], ours[k])
        # digit reversal: k = 9a+3b+c -> 9c+3b+a
        for k in range(27):
            a, b, c = k // 9, (k // 3) % 3, k % 3
            assert perm[k] == 9 * c + 3 * b + a

    def test_even_kernel_nonnegative(self):
        offs = me_kernel_offsets(2)
        assert offs.min() == 0 and offs.max() == 1 and offs.shape == (8, 3)


class TestDenseParity:
    N = 6
    CIN = 4
    COUT = 8

    def _feats(self, rng, n_rows):
        return rng.normal(size=(n_rows, self.CIN)).astype(np.float32)

    def test_submanifold_conv_matches_torch(self, rng):
        n = self.N
        grid, _, xyz = dense_grid(n)
        feats = self._feats(rng, n ** 3)
        # rows are a permutation of xyz order; build the torch input by coords
        coords = np.asarray(grid.coords)
        in_t = torch.zeros(1, self.CIN, n, n, n)
        in_t[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = torch.from_numpy(
            feats.T
        )
        wt = rng.normal(size=(self.COUT, self.CIN, 3, 3, 3)).astype(np.float32)
        out_t = torch.nn.functional.conv3d(
            in_t, torch.from_numpy(wt), padding=1
        ).numpy()[0]

        w_me = me_kernel_from_torch_conv(wt)
        w_ours = w_me[me_to_ours_perm(3)]  # the importer's --me-order step
        smap = same_level_map(grid)
        out = np.asarray(
            sparse_conv(jnp.asarray(feats), smap, jnp.asarray(w_ours))
        )
        ref = out_t[:, coords[:, 0], coords[:, 1], coords[:, 2]].T
        assert np.abs(out - ref).max() < 1e-4

    def test_strided_conv_matches_torch(self, rng):
        n = self.N
        grid, _, _ = dense_grid(n)
        feats = self._feats(rng, n ** 3)
        coords = np.asarray(grid.coords)
        in_t = torch.zeros(1, self.CIN, n, n, n)
        in_t[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = torch.from_numpy(
            feats.T
        )
        wt = rng.normal(size=(self.COUT, self.CIN, 3, 3, 3)).astype(np.float32)
        out_t = torch.nn.functional.conv3d(
            in_t, torch.from_numpy(wt), stride=2, padding=1
        ).numpy()[0]

        coarse, _ = downsample(grid, (n // 2) ** 3)
        dmap = down_map(grid, coarse)
        w_ours = me_kernel_from_torch_conv(wt)[me_to_ours_perm(3)]
        out = np.asarray(
            sparse_conv(jnp.asarray(feats), dmap, jnp.asarray(w_ours))
        )
        cc = np.asarray(coarse.coords)
        ok = np.asarray(coarse.mask)
        ref = out_t[:, cc[ok, 0], cc[ok, 1], cc[ok, 2]].T
        assert np.abs(out[ok] - ref).max() < 1e-4

    def test_transpose_conv_matches_torch(self, rng):
        n = self.N
        fine, _, _ = dense_grid(n)
        coarse, _ = downsample(fine, (n // 2) ** 3)
        nc = int(np.asarray(coarse.mask).sum())
        assert nc == (n // 2) ** 3
        feats_c = self._feats(rng, coarse.capacity)
        cc = np.asarray(coarse.coords)
        in_t = torch.zeros(1, self.CIN, n // 2, n // 2, n // 2)
        in_t[0, :, cc[:, 0], cc[:, 1], cc[:, 2]] = torch.from_numpy(feats_c.T)
        wt = rng.normal(size=(self.CIN, self.COUT, 3, 3, 3)).astype(np.float32)
        out_t = torch.nn.functional.conv_transpose3d(
            in_t, torch.from_numpy(wt), stride=2, padding=1, output_padding=1
        ).numpy()[0]
        assert out_t.shape[1] == n

        w_me_t = me_transpose_kernel_from_torch(wt)
        # the importer's transpose rule: permute to our offset order, then
        # REVERSE K (our up conv indexes by up offset = -down offset)
        w_ours = w_me_t[me_to_ours_perm(3)][::-1]
        umap = up_map(fine, coarse)
        out = np.asarray(
            sparse_conv(jnp.asarray(feats_c), umap, jnp.asarray(w_ours.copy()))
        )
        fc = np.asarray(fine.coords)
        ref = out_t[:, fc[:, 0], fc[:, 1], fc[:, 2]].T
        assert np.abs(out - ref).max() < 1e-4
