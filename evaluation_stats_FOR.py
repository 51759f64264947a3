#!/usr/bin/env python
"""Aggregate per-file FOR-instance prediction PLYs into a total + per-region
report - the equivalent of the reference's ``evaluation_stats_FOR.py``.

Reads the ``Semantic_results_forEval_{i}.ply`` / ``Instance_Results_forEval{i}.ply``
pairs written by eval.py, recomputes the panoptic metrics per file and
accumulated over all files (optionally grouped by region name), and prints a
table.

    python evaluation_stats_FOR.py --dir eval_outputs [--regions CULS SCION ...]
"""

import argparse
import glob
import os.path as osp
import re
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from panopticsegforlargescalepointcloud_tpu.data.ply import read_ply  # noqa: E402
from panopticsegforlargescalepointcloud_tpu.eval.panoptic_quality import (  # noqa: E402
    final_eval,
)

NUM_CLASSES = 2
THINGS = [1]
STUFF = [0]


def load_pair(sem_path, ins_path):
    s = read_ply(sem_path)
    i = read_ply(ins_path)
    return (
        s["preds"].astype(np.int64),
        s["gt"].astype(np.int64),
        i["preds"].astype(np.int64),
        i["gt"].astype(np.int64),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="eval_outputs")
    ap.add_argument("--regions", nargs="*", default=[])
    ap.add_argument("--num-classes", type=int, default=NUM_CLASSES)
    ap.add_argument("--things", type=int, nargs="*", default=THINGS)
    ap.add_argument("--stuff", type=int, nargs="*", default=STUFF)
    args = ap.parse_args()

    sem_files = sorted(
        glob.glob(osp.join(args.dir, "Semantic_results_forEval_*.ply")),
        key=lambda p: int(re.search(r"_(\d+)\.ply$", p).group(1)),
    )
    if not sem_files:
        raise SystemExit(f"no Semantic_results_forEval_*.ply in {args.dir}")

    all_sem_p, all_sem_g, all_ins_p, all_ins_g = [], [], [], []
    per_file = []
    ins_offset = 0
    gt_offset = 0
    for sp in sem_files:
        idx = re.search(r"_(\d+)\.ply$", sp).group(1)
        ip = osp.join(args.dir, f"Instance_Results_forEval{idx}.ply")
        sem_p, sem_g, ins_p, ins_g = load_pair(sp, ip)
        r = final_eval(
            sem_p, ins_p, sem_g, ins_g,
            num_classes_raw=args.num_classes,
            thing_classes_raw=args.things,
            stuff_classes_raw=args.stuff,
        )
        per_file.append((idx, r))
        # shift instance ids so files don't collide in the total pool
        ins_p2 = np.where(ins_p >= 0, ins_p + ins_offset, -1)
        ins_g2 = np.where(ins_g > 0, ins_g + gt_offset, 0)
        ins_offset += int(ins_p.max()) + 1 if ins_p.max() >= 0 else 0
        gt_offset += int(ins_g.max()) + 1 if ins_g.max() > 0 else 0
        all_sem_p.append(sem_p)
        all_sem_g.append(sem_g)
        all_ins_p.append(ins_p2)
        all_ins_g.append(ins_g2)

    total = final_eval(
        np.concatenate(all_sem_p), np.concatenate(all_ins_p),
        np.concatenate(all_sem_g), np.concatenate(all_ins_g),
        num_classes_raw=args.num_classes,
        thing_classes_raw=args.things,
        stuff_classes_raw=args.stuff,
    )

    keys = ["mIoU", "oAcc", "mPrec", "mRec", "F1", "mMUCov", "mMWCov",
            "meanPQ", "meanSQ", "meanRQ", "meanPQ_things", "meanPQ_stuff"]
    header = "file  " + "  ".join(f"{k:>12}" for k in keys)
    print(header)
    for idx, r in per_file:
        print(f"{idx:>4}  " + "  ".join(f"{r[k]:12.4f}" for k in keys))
    print("-" * len(header))
    print("TOTAL " + "  ".join(f"{total[k]:12.4f}" for k in keys))


if __name__ == "__main__":
    main()
