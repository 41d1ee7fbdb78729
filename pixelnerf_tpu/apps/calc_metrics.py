"""Offline metric aggregation over rendered PNGs (reference
eval/calc_metrics.py map-reduce): per-object PSNR/SSIM (+LPIPS when an lpips
install is available) against dataset ground truth, then a global and
per-category reduction.

    python -m pixelnerf_tpu.apps.calc_metrics -D <data> -F dvr --output eval_out
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ..data import get_split_dataset
from ..utils import metrics


def _lpips_model():
    try:
        import lpips  # optional; not in the base image

        return lpips.LPIPS(net="vgg")
    except Exception:
        return None


def run_map(args, dset):
    lp = _lpips_model()
    import imageio.v2 as imageio

    results = {}
    for obj_idx in range(len(dset)):
        data = dset[obj_idx]
        if not data:
            continue
        obj_name = os.path.basename(data["path"])
        if args.multicat:
            cat = os.path.basename(os.path.dirname(data["path"]))
            obj_name = f"{cat}_{obj_name}"
        obj_dir = os.path.join(args.output, obj_name)
        if not os.path.isdir(obj_dir):
            continue
        pngs = sorted(
            p
            for p in glob.glob(os.path.join(obj_dir, "*.png"))
            if os.path.splitext(os.path.basename(p))[0].isdigit()
        )
        psnrs, ssims, lpipss = [], [], []
        for png in pngs:
            view = int(os.path.splitext(os.path.basename(png))[0])
            pred = imageio.imread(png).astype(np.float32) / 255.0
            gt = data["images"][view] * 0.5 + 0.5
            psnrs.append(metrics.psnr(pred, gt))
            ssims.append(metrics.ssim(pred, gt, data_range=1.0))
            if lp is not None:
                import torch

                a = torch.tensor(pred * 2 - 1).permute(2, 0, 1)[None].float()
                b = torch.tensor(gt * 2 - 1).permute(2, 0, 1)[None].float()
                lpipss.append(float(lp(a, b)))
        if psnrs:
            entry = {
                "psnr": float(np.mean(psnrs)),
                "ssim": float(np.mean(ssims)),
                "n": len(psnrs),
            }
            if lpipss:
                entry["lpips"] = float(np.mean(lpipss))
            results[obj_name] = entry
            with open(os.path.join(obj_dir, "metrics.txt"), "w") as f:
                for k, v in entry.items():
                    f.write(f"{k} {v}\n")
            print(obj_name, entry)
    return results


def run_reduce(args, results):
    if not results:
        print("No results found")
        return
    total_n = sum(r["n"] for r in results.values())
    agg = {
        "psnr": sum(r["psnr"] * r["n"] for r in results.values()) / total_n,
        "ssim": sum(r["ssim"] * r["n"] for r in results.values()) / total_n,
    }
    if all("lpips" in r for r in results.values()):
        agg["lpips"] = sum(r["lpips"] * r["n"] for r in results.values()) / total_n
    print("TOTAL:", {k: round(v, 4) for k, v in agg.items()}, f"({total_n} views)")

    # per-category breakdown for multicat outputs (cat_objname naming)
    cats = {}
    for name, r in results.items():
        cat = name.split("_")[0]
        cats.setdefault(cat, []).append(r)
    if len(cats) > 1:
        for cat, rs in sorted(cats.items()):
            n = sum(r["n"] for r in rs)
            print(
                f"  {cat}: psnr {sum(r['psnr']*r['n'] for r in rs)/n:.3f} "
                f"ssim {sum(r['ssim']*r['n'] for r in rs)/n:.4f} (n={n})"
            )
    out_path = os.path.join(args.output, "all_metrics.txt")
    with open(out_path, "w") as f:
        for k, v in agg.items():
            f.write(f"{k} {v}\n")
    print("Wrote", out_path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", "-D", type=str, required=True)
    parser.add_argument("--dataset_format", "-F", type=str, default="dvr")
    parser.add_argument("--output", "-O", type=str, default="eval_out")
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--multicat", action="store_true")
    args = parser.parse_args(argv)
    dset = get_split_dataset(
        args.dataset_format, args.datadir, want_split=args.split, training=False
    )
    results = run_map(args, dset)
    run_reduce(args, results)


if __name__ == "__main__":
    main()
