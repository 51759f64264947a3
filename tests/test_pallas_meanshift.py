"""Pallas mean-shift update kernel (interpret mode on CPU) vs the XLA
formulation used in cluster/meanshift.py."""

import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.cluster.meanshift import _shift_iter
from panopticsegforlargescalepointcloud_tpu.cluster.pallas_meanshift import (
    meanshift_update,
)


class TestPallasMeanShift:
    def test_matches_xla_update(self, rng):
        s, np_, e = 16, 1000, 5
        seeds = rng.normal(size=(s, e)).astype(np.float32)
        pts = rng.normal(size=(np_, e)).astype(np.float32) * 2
        pv = rng.random(np_) > 0.2
        bw = 1.2

        ref_new, ref_cnt = _shift_iter(
            jnp.asarray(seeds), None, jnp.asarray(pts * pv[:, None]),
            jnp.asarray(pv), bw * bw,
        )
        got_new, got_cnt = meanshift_update(
            jnp.asarray(seeds), jnp.asarray(pts), jnp.asarray(pv), bw,
            point_tile=256, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_cnt), np.asarray(ref_cnt), atol=0.5)
        np.testing.assert_allclose(
            np.asarray(got_new), np.asarray(ref_new), rtol=1e-3, atol=1e-3
        )

    def test_empty_seed_keeps_position(self, rng):
        seeds = np.array([[100.0, 100.0]], np.float32)  # far from all points
        pts = rng.normal(size=(64, 2)).astype(np.float32)
        pv = np.ones(64, bool)
        new, cnt = meanshift_update(
            jnp.asarray(seeds), jnp.asarray(pts), jnp.asarray(pv), 0.5,
            point_tile=64, interpret=True,
        )
        assert float(cnt[0]) == 0
        np.testing.assert_allclose(np.asarray(new), seeds)
