#!/usr/bin/env python
"""Aggregate per-file FOR-instance prediction PLYs into a total + per-region
report - the equivalent of the reference's ``evaluation_stats_FOR.py``
(its headline output is "the average F1 score per forest region",
reference :9-11, written to Eval_F1_per_region).

Reads the ``Semantic_results_forEval_{i}.ply`` / ``Instance_Results_forEval{i}.ply``
pairs written by eval.py, recomputes the panoptic metrics per file and
accumulated over all files; plots are grouped into forest regions by matching
region names against the source filenames recorded in ``eval_manifest.json``
(the FOR-instance plots carry their region in the name, e.g.
``CULS_plot_2_annotated.ply``). Per-region rows pool all of the region's
plots, and the region table plus mean-over-regions F1 is also written to
``Eval_F1_per_region.txt``.

    python evaluation_stats_FOR.py --dir eval_outputs \
        [--regions CULS NIBIO RMIT SCION TUWIEN]
"""

import argparse
import glob
import json
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
# FOR-instance forest regions (plot filenames carry the region tag)
DEFAULT_REGIONS = ["CULS", "NIBIO", "RMIT", "SCION", "TUWIEN"]


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
    ap.add_argument(
        "--regions", nargs="*", default=None,
        help="region names matched against source filenames "
        f"(default: {' '.join(DEFAULT_REGIONS)} when a manifest exists)",
    )
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

    manifest = {}
    mpath = osp.join(args.dir, "eval_manifest.json")
    if osp.exists(mpath):
        manifest = json.load(open(mpath))

    arrays = {}  # idx -> (sem_p, sem_g, ins_p, ins_g)
    per_file = []
    for sp in sem_files:
        idx = re.search(r"_(\d+)\.ply$", sp).group(1)
        ip = osp.join(args.dir, f"Instance_Results_forEval{idx}.ply")
        sem_p, sem_g, ins_p, ins_g = load_pair(sp, ip)
        arrays[idx] = (sem_p, sem_g, ins_p, ins_g)
        r = final_eval(
            sem_p, ins_p, sem_g, ins_g,
            num_classes_raw=args.num_classes,
            thing_classes_raw=args.things,
            stuff_classes_raw=args.stuff,
        )
        per_file.append((idx, r))

    def pooled_eval(indices):
        """final_eval over several plots pooled, instance ids shifted so
        files never collide (the reference pools all plots the same way)."""
        sp, sg, ip_, ig = [], [], [], []
        ins_off = gt_off = 0
        for idx in indices:
            sem_p, sem_g, ins_p, ins_g = arrays[idx]
            ip_.append(np.where(ins_p >= 0, ins_p + ins_off, -1))
            ig.append(np.where(ins_g > 0, ins_g + gt_off, 0))
            ins_off += int(ins_p.max()) + 1 if ins_p.max() >= 0 else 0
            gt_off += int(ins_g.max()) + 1 if ins_g.max() > 0 else 0
            sp.append(sem_p)
            sg.append(sem_g)
        return final_eval(
            np.concatenate(sp), np.concatenate(ip_),
            np.concatenate(sg), np.concatenate(ig),
            num_classes_raw=args.num_classes,
            thing_classes_raw=args.things,
            stuff_classes_raw=args.stuff,
        )

    total = pooled_eval([idx for idx, _ in per_file])

    keys = ["mIoU", "oAcc", "mPrec", "mRec", "F1", "mMUCov", "mMWCov",
            "meanPQ", "meanSQ", "meanRQ", "meanPQ_things", "meanPQ_stuff"]
    header = "file  " + "  ".join(f"{k:>12}" for k in keys)
    print(header)
    for idx, r in per_file:
        print(f"{idx:>4}  " + "  ".join(f"{r[k]:12.4f}" for k in keys))
    print("-" * len(header))
    print("TOTAL " + "  ".join(f"{total[k]:12.4f}" for k in keys))

    # ---- per-region grouping (the reference's headline: mean F1 per forest
    # region, saved as Eval_F1_per_region) ----
    regions = args.regions
    if regions is None:
        regions = DEFAULT_REGIONS if manifest else []
    groups = {}
    for idx, _ in per_file:
        name = manifest.get(idx, "")
        for reg in regions:
            if reg.lower() in name.lower():
                groups.setdefault(reg, []).append(idx)
                break
    if groups:
        lines = ["region  plots  " + "  ".join(f"{k:>12}" for k in keys)]
        f1s = []
        for reg in regions:
            if reg not in groups:
                continue
            r = pooled_eval(groups[reg])
            f1s.append(r["F1"])
            lines.append(
                f"{reg:>6}  {len(groups[reg]):>5}  "
                + "  ".join(f"{r[k]:12.4f}" for k in keys)
            )
        lines.append(f"mean F1 over regions: {float(np.mean(f1s)):.4f}")
        report = "\n".join(lines)
        print(report)
        with open(osp.join(args.dir, "Eval_F1_per_region.txt"), "w") as f:
            f.write(report + "\n")
    elif regions:
        print("(no files matched the given regions; is eval_manifest.json present?)")


if __name__ == "__main__":
    main()
