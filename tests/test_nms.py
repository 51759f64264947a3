"""NMS/get_instances tests (device path) vs the host-side extract_clusters."""

import jax.numpy as jnp
import numpy as np

from panopticsegforlargescalepointcloud_tpu.cluster.nms import (
    get_instances,
    greedy_nms,
    pairwise_iou,
    proposal_masks,
)
from panopticsegforlargescalepointcloud_tpu.eval.extract import extract_clusters
from panopticsegforlargescalepointcloud_tpu.models.losses import Proposals


def make_props(clusters, num_props, budget):
    pi = np.full(budget, -1, np.int32)
    pid = np.full(budget, -1, np.int32)
    mv = np.zeros(budget, bool)
    pv = np.zeros(num_props, bool)
    ofs = 0
    for i, cl in enumerate(clusters):
        pi[ofs:ofs + len(cl)] = cl
        pid[ofs:ofs + len(cl)] = i
        mv[ofs:ofs + len(cl)] = True
        pv[i] = True
        ofs += len(cl)
    return Proposals(
        jnp.asarray(pi), jnp.asarray(pid), jnp.asarray(mv), jnp.asarray(pv),
        jnp.zeros(num_props, jnp.int32), jnp.zeros(num_props, jnp.int32),
    )


class TestNMS:
    def test_pairwise_iou_and_masks(self):
        clusters = [np.arange(0, 10), np.arange(5, 15), np.arange(20, 30)]
        props = make_props(clusters, 4, 64)
        masks = np.asarray(proposal_masks(props, 40))
        assert masks.sum() == 30
        iou = np.asarray(pairwise_iou(jnp.asarray(masks)))
        np.testing.assert_allclose(iou[0, 1], 5 / 15, rtol=1e-6)
        assert iou[0, 2] == 0

    def test_greedy_nms_suppresses_overlap(self):
        clusters = [np.arange(0, 10), np.arange(0, 9), np.arange(20, 30)]
        props = make_props(clusters, 3, 64)
        masks = proposal_masks(props, 40)
        iou = pairwise_iou(masks)
        scores = jnp.asarray([0.5, 0.9, 0.7])
        keep = np.asarray(greedy_nms(iou, scores, props.prop_valid, 0.3))
        # cluster 1 outranks cluster 0 (iou 0.9) -> 0 suppressed
        assert keep.tolist() == [False, True, True]

    def test_device_matches_host_extraction(self, rng):
        n = 200
        clusters = [
            rng.choice(n, size=60, replace=False),
            rng.choice(n, size=55, replace=False),
            rng.choice(n, size=30, replace=False),
            rng.choice(n, size=120, replace=False),
        ]
        scores = np.array([0.9, 0.85, 0.95, 0.2, 0.0, 0.0], np.float32)
        props = make_props(clusters, 6, 512)
        keep_dev, _ = get_instances(
            props, jnp.asarray(scores), n,
            nms_threshold=0.3, min_cluster_points=40, min_score=0.5,
        )
        keep_dev = set(np.where(np.asarray(keep_dev))[0].tolist())
        from panopticsegforlargescalepointcloud_tpu.eval.extract import (
            proposals_to_numpy,
        )
        host_clusters, kept = extract_clusters(
            proposals_to_numpy(props), scores, n,
            nms_threshold=0.3, min_cluster_points=40, min_score=0.5,
        )
        assert keep_dev == set(kept)
