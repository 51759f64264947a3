"""Scorer-grid bit budget: tall/wide proposals must keep every member voxel.

Regression tests for VERDICT r1 #3 / ADVICE r1 high: the old layout
(8,8,6 with a min-corner origin) silently dropped voxels beyond 128x128x32
of the proposal's min corner, i.e. most of a 20-30 m tree at 0.2 m voxels.
The scorer grid now centers coords per proposal (bbox midpoint) under a
configurable layout (default (7,7,9): +-64 lateral, +-256 vertical) and
reports an overflow counter that must be 0 for realistic proposals.

Reference behavior: full-cluster scoring at
/root/reference/torch_points3d/models/panoptic/PointGroup3heads.py:399-407.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from panopticsegforlargescalepointcloud_tpu.models.losses import Proposals
from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
    PanopticConfig,
    scorer_inputs,
)


def _cfg(**kw):
    base = dict(
        num_classes=2, stuff_classes=(0,), backbone="tiny", feat_dim=4,
        in_feat=8, num_samples=1, max_instances=8, max_props_rg=16,
        cluster_type=1,
    )
    base.update(kw)
    return PanopticConfig(**base)


def _column_proposal(cfg, n_z, x0=40, y0=-25, z0=5):
    """One proposal: a single-voxel-wide column of n_z voxels starting at an
    arbitrary absolute corner (coords are tile-absolute ints)."""
    coords = np.stack(
        [np.full(n_z, x0), np.full(n_z, y0), z0 + np.arange(n_z)], axis=1
    ).astype(np.int32)
    m = n_z
    props = Proposals(
        point_idx=jnp.arange(m, dtype=jnp.int32),
        prop_id=jnp.zeros(m, jnp.int32),
        member_valid=jnp.ones(m, bool),
        prop_valid=jnp.arange(cfg.total_props) < 1,
        prop_batch=jnp.where(jnp.arange(cfg.total_props) < 1, 0, -1),
        prop_type=jnp.zeros(cfg.total_props, jnp.int32),
    )
    feats = jnp.ones((m, cfg.in_feat), jnp.float32)
    return props, jnp.asarray(coords), feats


class TestTallProposals:
    def test_30m_tree_keeps_every_voxel(self):
        """150 z-voxels (30 m at 0.2 m) - taller than the old 32-voxel budget."""
        cfg = _cfg()
        props, coords, feats = _column_proposal(cfg, n_z=150)
        grid, hier, sf, inverse, overflow = scorer_inputs(cfg, props, coords, feats)
        assert int(overflow) == 0
        assert np.all(np.asarray(inverse) >= 0), "every member must get a row"
        assert int(np.sum(np.asarray(grid.mask))) == 150
        # features landed on their rows
        assert np.asarray(sf)[np.asarray(inverse)].sum() == 150 * cfg.in_feat

    def test_offset_far_from_origin(self):
        """Centering must remove the absolute position, not assume small coords."""
        cfg = _cfg()
        props, coords, feats = _column_proposal(cfg, n_z=400, x0=-120, y0=118, z0=-200)
        grid, hier, sf, inverse, overflow = scorer_inputs(cfg, props, coords, feats)
        assert int(overflow) == 0
        assert int(np.sum(np.asarray(grid.mask))) == 400

    def test_overflow_counted_not_silent(self):
        """A 600-voxel column exceeds the +-256 z budget: the excess is
        counted and exactly the in-budget voxels survive."""
        cfg = _cfg()
        props, coords, feats = _column_proposal(cfg, n_z=600)
        grid, hier, sf, inverse, overflow = scorer_inputs(cfg, props, coords, feats)
        assert int(overflow) == 600 - 512
        assert int(np.sum(np.asarray(grid.mask))) == 512
        inv = np.asarray(inverse)
        assert np.sum(inv < 0) == 600 - 512

    def test_config_rejects_too_many_props_for_layout(self):
        with pytest.raises(ValueError):
            _cfg(scorer_bits=(10, 10, 10), max_props_rg=64)

    def test_wider_layout_via_config(self):
        cfg = _cfg(scorer_bits=(9, 9, 9), max_props_rg=8)
        props, coords, feats = _column_proposal(cfg, n_z=150, x0=200, y0=-200)
        _, _, _, inverse, overflow = scorer_inputs(cfg, props, coords, feats)
        assert int(overflow) == 0
        assert np.all(np.asarray(inverse) >= 0)


def _dup_column_proposal(cfg, n_z, dup):
    """One proposal of n_z voxels with ``dup`` member points per voxel -
    the realistic shape where membership rows far exceed unique scorer-grid
    voxels (several points per 0.12-0.2 m voxel)."""
    m = n_z * dup
    coords = np.stack(
        [np.full(n_z, 3), np.full(n_z, -4), 7 + np.arange(n_z)], axis=1
    ).astype(np.int32)
    coords = np.repeat(coords, dup, axis=0)
    props = Proposals(
        point_idx=jnp.arange(m, dtype=jnp.int32),
        prop_id=jnp.zeros(m, jnp.int32),
        member_valid=jnp.ones(m, bool),
        prop_valid=jnp.arange(cfg.total_props) < 1,
        prop_batch=jnp.where(jnp.arange(cfg.total_props) < 1, 0, -1),
        prop_type=jnp.zeros(cfg.total_props, jnp.int32),
    )
    feats = jnp.ones((m, cfg.in_feat), jnp.float32)
    return props, jnp.asarray(coords), feats


class TestScorerCapacityMult:
    """scorer_capacity_mult shrinks the ScoreNet grid below the
    membership-row budget (measured occupancy is a fraction of it,
    PLAN.md r3). Shrinking must be lossless while real occupancy fits and
    an exact counted overflow when it binds (VERDICT r2 tasks 1/6)."""

    def test_half_grid_is_lossless_at_real_occupancy(self):
        # 600 membership rows but only 150 unique (prop, voxel) pairs
        full = _cfg()
        props, coords, feats = _dup_column_proposal(full, n_z=150, dup=4)
        half = _cfg(scorer_capacity_mult=0.5)
        ga, _, sfa, inva, ova = scorer_inputs(full, props, coords, feats)
        gb, _, sfb, invb, ovb = scorer_inputs(half, props, coords, feats)
        assert int(ova) == 0 and int(ovb) == 0
        assert gb.keys.shape[0] < ga.keys.shape[0]
        ka = np.sort(np.asarray(ga.keys)[np.asarray(ga.mask)])
        kb = np.sort(np.asarray(gb.keys)[np.asarray(gb.mask)])
        np.testing.assert_array_equal(ka, kb)
        # every member maps to a live row carrying its features in both
        for sf, inv in ((sfa, inva), (sfb, invb)):
            inv = np.asarray(inv)
            assert np.all(inv >= 0)
            np.testing.assert_allclose(
                np.asarray(sf)[inv], np.asarray(feats), rtol=0, atol=0
            )

    def test_binding_cap_counts_exact_overflow(self):
        cfg = _cfg(scorer_capacity_mult=0.25)  # 600 rows -> 256-row grid
        props, coords, feats = _dup_column_proposal(cfg, n_z=500, dup=1)
        grid, _, _, inverse, overflow = scorer_inputs(cfg, props, coords, feats)
        cap = grid.keys.shape[0]
        assert cap == 256
        assert int(overflow) == 500 - cap
        assert int(np.sum(np.asarray(grid.mask))) == cap
        assert np.sum(np.asarray(inverse) < 0) == 500 - cap
