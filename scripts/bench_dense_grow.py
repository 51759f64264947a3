"""Dense MXU min-pull region growing vs the edge path, at product shapes.

Compares region_grow_folded(dense_pull=False) (radius-graph build + edge
propagation) against dense_pull=True (all-pairs distance matmuls,
cluster/dense_grow.py) on a synthetic forest-like tile at the eval
(rg_point_cap=20480) and train (49152) compaction budgets.

Usage: python scripts/bench_dense_grow.py [point_cap ...]
Chained-dependency timing protocol (bench.py): block_until_ready is
unreliable over the axon tunnel.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 8


def measure(step, x0):
    def chain(n):
        x, s = x0, None
        for _ in range(n):
            x, s = step(x)
        return float(s)

    chain(1)
    t0 = time.perf_counter()
    chain(1)
    t1 = time.perf_counter()
    chain(ITERS + 1)
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS * 1e3


def main():
    from panopticsegforlargescalepointcloud_tpu.cluster.region_grow import (
        region_grow_folded,
    )

    caps = [int(a) for a in sys.argv[1:]] or [20480, 49152]
    rng = np.random.default_rng(0)
    for cap in caps:
        n = 131072
        # forest-like: ~40% thing rows in class-colored blobs, radius 0.18
        pos = rng.uniform(0, 16, size=(n, 3)).astype(np.float32)
        k = 96
        centers = rng.uniform(0, 16, size=(k, 3)).astype(np.float32)
        blob = rng.integers(0, k, n)
        thingy = rng.random(n) < 0.4
        pos[thingy] = centers[blob[thingy]] + rng.normal(
            scale=0.35, size=(int(thingy.sum()), 3)
        ).astype(np.float32)
        sem = np.where(thingy, 2, 1).astype(np.int32)
        batch = (np.arange(n) * 4 // n).astype(np.int32)
        grow = thingy & (rng.random(n) > 0.02)

        args = (jnp.asarray(pos), jnp.asarray(sem), jnp.asarray(batch),
                jnp.asarray(grow))
        kw = dict(
            radius=0.27, max_proposals=128, num_classes=9, num_samples=4,
            min_cluster_size=10, k_neighbors=16, cell_cap=8, point_cap=cap,
        )

        for name, dense in [("edge", False), ("dense", True)]:
            f = jax.jit(
                lambda x, dense=dense: (lambda r: (
                    x + 1e-30 * jnp.sum(r.point_prop).astype(x.dtype),
                    jnp.sum(r.point_prop) + r.num_props,
                ))(region_grow_folded(
                    args[0] + x, args[1], args[2], args[3], **kw,
                    dense_pull=dense,
                ))
            )
            t = measure(f, jnp.zeros((n, 3), jnp.float32))
            print(f"cap={cap} {name}: {t:8.2f} ms")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
