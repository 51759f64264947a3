"""Host-side tile transforms (numpy, rng-driven).

Behavioral ports of the reference transform pipeline used by the paper
configs (``/root/reference/conf/data/panoptic/treeins_rad8.yaml:24-82``):
train = RandomNoise, RandomRotate(z 180), RandomScaleAnisotropic(0.9-1.1),
RandomSymmetry(x), XYZRela+XYZ features, Center, GridSampling3D(quantize),
ShiftVoxels; test = features, Center, GridSampling3D(quantize).
Reference sources: core/data_transform/transforms.py (noise :523, symmetry
:498, scale :560, shift :734), features.py (:331-399).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .voxelize import grid_sample


def random_noise(pos, rng, sigma=0.01, clip=0.05):
    noise = np.clip(sigma * rng.standard_normal(pos.shape), -clip, clip)
    return pos + noise.astype(pos.dtype)


def random_rotate_z(pos, rng, degrees=180.0):
    a = np.deg2rad(rng.uniform(-degrees, degrees))
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], pos.dtype)
    return pos @ rot.T


def random_scale_anisotropic(pos, rng, scales=(0.9, 1.1)):
    s = rng.uniform(scales[0], scales[1], size=3).astype(pos.dtype)
    return pos * s


def random_symmetry(pos, rng, axis=(True, False, False)):
    pos = pos.copy()
    for i, ax in enumerate(axis):
        if ax and rng.random() < 0.5:
            pos[:, i] = pos[:, i].max() - pos[:, i]
    return pos


def make_features(pos) -> np.ndarray:
    """FEAT=4 input features: [x_rela, y_rela, z_rela, z_abs] where *_rela =
    pos - mean(pos) (XYZRelaFeature) and z_abs is the raw z (XYZFeature)."""
    rela = pos - pos.mean(0, keepdims=True)
    return np.concatenate([rela, pos[:, 2:3]], axis=1).astype(np.float32)


def finalize_tile(
    pos: np.ndarray,
    attrs: Dict[str, np.ndarray],
    grid_size: float,
    rng: np.random.Generator,
    train: bool,
    shift_voxels: bool = True,
) -> dict:
    """features -> Center -> quantized voxelization -> (ShiftVoxels).

    Returns the tile dict consumed by collate_tiles: keys coords/feats/pos
    plus the surviving attrs.
    """
    feats = make_features(pos)
    center = pos.mean(0, keepdims=True)
    pos_c = (pos - center).astype(np.float32)
    out_pos, out = grid_sample(
        pos_c, {**attrs, "_feats": feats}, grid_size, mode="last", rng=rng
    )
    coords = np.round(out_pos / grid_size).astype(np.int32)
    if train and shift_voxels:
        coords = coords + rng.integers(0, 100, size=3).astype(np.int32)
        # keep keys in the packed-bit budget: re-center the shifted lattice
        coords = coords - (coords.min(0) + coords.max(0)) // 2
    tile = dict(out)
    tile["feats"] = tile.pop("_feats")
    tile["coords"] = coords
    tile["pos"] = out_pos
    return tile


def augment_tile(pos: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """The paper's train-time geometric augmentation stack."""
    pos = random_noise(pos, rng)
    pos = random_rotate_z(pos, rng)
    pos = random_scale_anisotropic(pos, rng)
    pos = random_symmetry(pos, rng)
    return pos.astype(np.float32)
