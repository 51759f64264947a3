"""Split region_grow wall (442ms on a 32k eval tile) into: radius_neighbors /
edge filtering / propagation loop; also report the converged iteration count.

Same chained-dependency timing protocol as bench.py.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = 6


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
    from bench import build_inputs
    from panopticsegforlargescalepointcloud_tpu.cluster.neighbors import radius_neighbors
    from panopticsegforlargescalepointcloud_tpu.cluster.region_grow import region_grow_folded
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import PanopticConfig
    from panopticsegforlargescalepointcloud_tpu.ops.scatter import segment_sum
    from panopticsegforlargescalepointcloud_tpu.train.step import batch_arrays, prepare_example

    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    cfg = PanopticConfig(
        num_classes=9, stuff_classes=(0, 7, 8), backbone="paper", feat_dim=4,
        in_feat=16, num_samples=1, max_instances=64, cluster_radius=0.18,
    )
    vb = build_inputs(num_tiles=1, capacity=cap)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, cfg.num_down)

    pos = db.pos
    batch = db.grid.batch
    valid = db.grid.mask
    n = pos.shape[0]
    rng = np.random.default_rng(0)
    # realistic semantics: few classes, spatially-clustered instances exist in
    # the synthetic tile's instance labels; use those as "predictions"
    pred = jnp.where(db.instance_mask, 1, 0).astype(jnp.int32)
    thing = valid & db.instance_mask

    @jax.jit
    def f_nbr(x):
        nbr_idx, _ = radius_neighbors(
            pos + x, batch, thing, cfg.cluster_radius,
            k=cfg.rg_k_neighbors, cell_cap=cfg.rg_cell_cap,
        )
        s = jnp.sum(nbr_idx.astype(jnp.float32))
        return x + 1e-30 * s.astype(x.dtype), s

    @jax.jit
    def f_rg(x):
        rg = region_grow_folded(
            pos + x, pred, batch, thing, radius=cfg.cluster_radius,
            max_proposals=cfg.max_props_rg, num_classes=cfg.num_classes,
            num_samples=cfg.num_samples, min_cluster_size=cfg.min_cluster_size,
            k_neighbors=cfg.rg_k_neighbors, cell_cap=cfg.rg_cell_cap,
        )
        s = jnp.sum(rg.point_prop.astype(jnp.float32))
        return x + 1e-30 * s.astype(x.dtype), s

    # iteration count: replicate the loop with an iteration counter output
    @jax.jit
    def count_iters(x):
        nbr_idx, _ = radius_neighbors(
            pos + x, batch, thing, cfg.cluster_radius,
            k=cfg.rg_k_neighbors, cell_cap=cfg.rg_cell_cap,
        )
        safe = jnp.maximum(nbr_idx, 0)
        same_class = jnp.take(pred, safe) == pred[:, None]
        nbr_ok = (nbr_idx >= 0) & same_class & jnp.take(thing, safe)
        nbr_ok = nbr_ok & thing[:, None]
        nbr = jnp.where(nbr_ok, nbr_idx, -1)
        init_labels = jnp.where(thing, jnp.arange(n, dtype=jnp.int32), n)

        def body(state):
            labels, _, it = state
            safe_nbr = jnp.maximum(nbr, 0)
            nbr_labels = jnp.where(nbr >= 0, jnp.take(labels, safe_nbr), n)
            pulled = jnp.minimum(labels, jnp.min(nbr_labels, axis=1))
            pushed = jnp.full((n + 1,), n, dtype=jnp.int32)
            idx = jnp.where(nbr >= 0, nbr, n)
            pushed = pushed.at[idx.reshape(-1)].min(
                jnp.broadcast_to(pulled[:, None], nbr.shape).reshape(-1)
            )
            new = jnp.minimum(pulled, pushed[:n])
            new = jnp.minimum(new, jnp.take(jnp.append(new, n), jnp.minimum(new, n)))
            new = jnp.where(thing, new, n)
            changed = jnp.any(new != labels)
            return new, changed, it + 1

        def cond(state):
            return state[1] & (state[2] < 64)

        labels, _, iters = jax.lax.while_loop(
            cond, body, (init_labels, jnp.bool_(True), jnp.int32(0))
        )
        return iters

    from panopticsegforlargescalepointcloud_tpu.cluster.neighbors import radius_graph
    from panopticsegforlargescalepointcloud_tpu.cluster.region_grow import _fold_bits

    ids = batch * jnp.int32(cfg.num_classes) + pred
    fbits = _fold_bits(cfg.num_samples * cfg.num_classes)

    def mk_graph(with_reverse):
        @jax.jit
        def f(x):
            fwd, rev, _ = radius_graph(
                pos + x, ids, thing, cfg.cluster_radius,
                k=cfg.rg_k_neighbors, cell_cap=cfg.rg_cell_cap, bits=fbits,
                with_reverse=with_reverse,
            )
            s = jnp.sum(fwd.astype(jnp.float32)) + jnp.sum(rev.astype(jnp.float32))
            return x + 1e-30 * s.astype(x.dtype), s
        return f

    from panopticsegforlargescalepointcloud_tpu.cluster.region_grow import _grow_on_edges

    fwd0, rev0, _ = jax.jit(lambda: radius_graph(
        pos, ids, thing, cfg.cluster_radius, k=cfg.rg_k_neighbors,
        cell_cap=cfg.rg_cell_cap, bits=fbits,
    ))()

    @jax.jit
    def f_loop(x):
        jitter = (x[0, 0] * 1e-30).astype(jnp.int32)  # defeat CSE, keeps edges
        rg = _grow_on_edges(
            fwd0 + jitter, rev0, batch, thing, cfg.max_props_rg,
            cfg.min_cluster_size, 64,
        )
        s = jnp.sum(rg.point_prop.astype(jnp.float32))
        return x + 1e-30 * s.astype(x.dtype), s

    @jax.jit
    def count_iters_new():
        adj = jnp.concatenate([fwd0, rev0], axis=1)
        safe_adj = jnp.maximum(adj, 0)
        init = jnp.where(thing, jnp.arange(n, dtype=jnp.int32), n)

        def body(state):
            labels, _, it = state
            nl = jnp.where(adj >= 0, jnp.take(labels, safe_adj), n)
            new = jnp.minimum(labels, jnp.min(nl, axis=1))
            for _ in range(2):
                new = jnp.minimum(new, jnp.take(jnp.append(new, n), jnp.minimum(new, n)))
            new = jnp.where(thing, new, n)
            return new, jnp.any(new != labels), it + 1

        labels, _, iters = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < 64), body, (init, jnp.bool_(True), jnp.int32(0))
        )
        return iters

    x3 = jnp.zeros((n, 3), jnp.float32)
    nthing = int(jnp.sum(thing))
    print(f"cap={cap} n_thing={nthing} k={cfg.rg_k_neighbors} cell_cap={cfg.rg_cell_cap}")
    print(f"new-loop iters: {int(count_iters_new())}")
    print(f"loop+compact:     {measure(f_loop, x3):8.2f} ms")
    sys.stdout.flush()
    print(f"iters to converge: {int(count_iters(x3))}")
    sys.stdout.flush()
    print(f"radius_neighbors: {measure(f_nbr, x3):8.2f} ms")
    sys.stdout.flush()
    print(f"graph fwd only:   {measure(mk_graph(False), x3):8.2f} ms")
    sys.stdout.flush()
    print(f"graph fwd+rev:    {measure(mk_graph(True), x3):8.2f} ms")
    sys.stdout.flush()
    print(f"region_grow full: {measure(f_rg, x3):8.2f} ms")


if __name__ == "__main__":
    main()
