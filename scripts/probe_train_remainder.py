"""Split the full train step's clustering remainder (full - prepare) into
build_proposals vs the ScoreNet path (scorer_inputs + scorer UNet fwd+bwd +
score/mask losses).

Three full train steps at bench shapes, differing only in config:
  A shipped flagship yaml (scorer_type='unet')        -> everything
  B scorer_type='' (semantic-certainty confidence)    -> no scorer UNet/grid
  C with_clustering=False                             -> the prepare step

A-B ~= scorer grid + UNet fwd+bwd + score loss; B-C ~= build_proposals
(region grow + mean shift + assembly) + certainty score + score loss glue.

Usage: python scripts/probe_train_remainder.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

ITERS = 6


def measure(step, state0, arrays):
    def chain(n):
        st = state0
        for _ in range(n):
            st, metrics = step(st, arrays)
        return float(metrics["loss"])

    chain(1)
    t0 = time.perf_counter()
    chain(1)
    t1 = time.perf_counter()
    chain(ITERS + 1)
    t2 = time.perf_counter()
    return max((t2 - t1) - (t1 - t0), 1e-9) / ITERS * 1e3


def main():
    from bench import build_inputs, shipped_config
    from panopticsegforlargescalepointcloud_tpu.models.pointgroup3heads import (
        PointGroup3HeadsNet,
    )
    from panopticsegforlargescalepointcloud_tpu.train.step import (
        batch_arrays,
        init_state,
        make_train_step,
        prepare_example,
    )

    num_tiles = 4
    cfg, ycfg = shipped_config(
        "npm3d-sparseconv_grid_012_R_16_cylinder_area1", num_samples=num_tiles
    )
    capacity = int(ycfg["data"].get("voxel_capacity", 131072))
    vb = build_inputs(num_tiles=num_tiles, capacity=capacity)
    arrays = tuple(jnp.asarray(a) for a in batch_arrays(vb))
    db, hier = prepare_example(arrays, cfg.num_down)
    tx = optax.adam(1e-3)

    variants = {
        "A": ("A full (scorer=unet)", cfg, True),
        "B": ("B certainty scorer  ", dataclasses.replace(cfg, scorer_type=""), True),
        "C": ("C prepare (no clust)", cfg, False),
    }
    import os

    name, c, clust = variants[os.environ["PST_REMAINDER_VARIANT"]]
    model = PointGroup3HeadsNet(c)
    state0 = init_state(c, model, tx, db, hier, jax.random.PRNGKey(0))
    step = make_train_step(c, model, tx, with_clustering=clust)
    t = measure(step, state0, arrays)
    print(f"  {name}: {t:8.1f} ms")
    sys.stdout.flush()


if __name__ == "__main__":
    # One variant per PROCESS (PST_REMAINDER_VARIANT=A|B|C): keeping three
    # compiled full-step executables + states alive in one process trips the
    # axon backend (InvalidArgument on the second variant's first fetch, r5
    # session log) even though each variant runs fine alone. With the env
    # var unset, re-exec once per variant before touching jax.
    import os
    import subprocess

    if os.environ.get("PST_REMAINDER_VARIANT") is None:
        for v in ("A", "B", "C"):
            env = dict(os.environ, PST_REMAINDER_VARIANT=v)
            subprocess.run([sys.executable, __file__], env=env, check=False)
    else:
        main()
