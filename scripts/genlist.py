#!/usr/bin/env python
"""Generate the ``gen_*.lst`` split files for the unseen-category experiment.

The reference's sn64_unseen experiment needs per-category ``gen_train.lst``
/ ``gen_val.lst`` / ``gen_test.lst`` files inside the NMR dataset, produced
by a ``genlist.py`` that ships with the authors' dataset download (reference
README.md:33,149) — it is NOT in the reference repository. This script
reconstructs it from two in-repo sources of truth:

* the protocol (pixelNeRF paper §5.1): train on the airplane (02691156),
  car (02958343) and chair (03001627) categories; evaluate on the 10
  categories never seen in training;
* ``viewlist/src_gen.txt`` — the authors' shipped eval assignment, which
  enumerates the exact (category, object) test instances for those 10
  categories (25,463 objects). When present it defines ``gen_test.lst``
  verbatim, guaranteeing eval parity; otherwise the softras_test split of
  each unseen category is used.

Usage:
    python scripts/genlist.py --data <path>/NMR_Dataset \
        [--viewlist viewlist/src_gen.txt]

Then train/eval with ``-F dvr_gen`` (list_prefix ``gen_``), e.g.
``python -m pixelnerf_tpu.apps.train -n sn64_unseen -c conf/exp/sn64_unseen.conf
-D <path>/NMR_Dataset``.
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

SEEN_CATS = ("02691156", "02958343", "03001627")  # airplane, car, chair


def _read_lst(path):
    if not os.path.isfile(path):
        return []
    with open(path) as f:
        return [x.strip() for x in f if x.strip()]


def _write_lst(path, objs):
    with open(path, "w") as f:
        f.write("\n".join(objs) + ("\n" if objs else ""))


def main(argv=None) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data", required=True, help="NMR_Dataset directory")
    ap.add_argument(
        "--viewlist",
        default=os.path.join(repo, "viewlist", "src_gen.txt"),
        help="authors' unseen-category eval list (defines gen_test.lst)",
    )
    args = ap.parse_args(argv)

    cats = sorted(
        d for d in os.listdir(args.data)
        if os.path.isdir(os.path.join(args.data, d))
    )
    if not cats:
        print(f"no category directories under {args.data}", file=sys.stderr)
        return 1

    test_by_cat = defaultdict(list)
    if os.path.isfile(args.viewlist):
        with open(args.viewlist) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    test_by_cat[parts[0]].append(parts[1])
        print(
            f"gen_test from {args.viewlist}: "
            f"{sum(map(len, test_by_cat.values()))} objects, "
            f"{len(test_by_cat)} categories"
        )
    else:
        print(
            f"viewlist {args.viewlist} missing — falling back to each "
            "unseen category's softras_test split",
            file=sys.stderr,
        )

    for cat in cats:
        cdir = os.path.join(args.data, cat)
        if cat in SEEN_CATS:
            train = _read_lst(os.path.join(cdir, "softras_train.lst"))
            val = _read_lst(os.path.join(cdir, "softras_val.lst"))
            test = []
            if not train:
                print(f"WARNING: {cat} has no softras_train.lst objects",
                      file=sys.stderr)
        else:
            train, val = [], []
            test = test_by_cat.get(cat) or _read_lst(
                os.path.join(cdir, "softras_test.lst")
            )
        _write_lst(os.path.join(cdir, "gen_train.lst"), train)
        _write_lst(os.path.join(cdir, "gen_val.lst"), val)
        _write_lst(os.path.join(cdir, "gen_test.lst"), test)
        role = "seen/train" if cat in SEEN_CATS else "unseen/test"
        print(
            f"  {cat} ({role}): train {len(train)} val {len(val)} "
            f"test {len(test)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
