"""Real-image preprocessor (reference scripts/preproc.py).

Segments the foreground object, fits an ellipse to the mask contour, crops a
square region around it, composites onto white, and resizes to 128x128,
writing ``*_normalize.png`` for eval_real.

Segmentation backends:
- detectron2 PointRend (the reference's choice) when installed;
- otherwise a cv2 GrabCut fallback seeded by a central prior — no extra
  dependencies, adequate for centered product-style photos.

    python -m pixelnerf_tpu.apps.preproc --input raw/ --output input/
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def _segment_pointrend(img_bgr, coco_class: int):
    from detectron2.config import get_cfg  # optional heavy dep
    from detectron2.engine import DefaultPredictor
    from detectron2.projects import point_rend

    cfg = get_cfg()
    point_rend.add_pointrend_config(cfg)
    cfg.merge_from_file(
        point_rend.__path__[0] + "/configs/InstanceSegmentation/"
        "pointrend_rcnn_R_50_FPN_3x_coco.yaml"
    )
    predictor = DefaultPredictor(cfg)
    out = predictor(img_bgr)["instances"]
    keep = out.pred_classes == coco_class
    if keep.sum() == 0:
        return None
    masks = out.pred_masks[keep].cpu().numpy()
    areas = masks.sum(axis=(1, 2))
    return masks[int(np.argmax(areas))].astype(np.uint8) * 255


def _cleanup_mask(mask):
    """Largest connected component + morphological close + hole fill —
    removes stray background blobs and closes interior holes (car windows
    etc.) that the color model misclassifies."""
    import cv2

    n, lab, stats, _ = cv2.connectedComponentsWithStats(
        (mask > 0).astype(np.uint8), 8
    )
    if n > 1:
        big = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        mask = np.where(lab == big, 255, 0).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k)
    # hole fill: flood the background from a guaranteed-background 1px ring
    # (flooding only from (0,0) breaks when the mask touches that corner)
    inv = np.pad((mask == 0).astype(np.uint8), 1, constant_values=1)
    border = np.zeros((inv.shape[0] + 2, inv.shape[1] + 2), np.uint8)
    cv2.floodFill(inv, border, (0, 0), 0)
    holes = inv[1:-1, 1:-1]  # 1 only where background is enclosed by mask
    return np.where((mask > 0) | (holes > 0), 255, 0).astype(np.uint8)


def _segment_grabcut(img_bgr, iters: int = 10):
    """Two-pass GrabCut seeded by a central prior, with mask cleanup.

    Pass 1 runs rect-initialized GrabCut; pass 2 re-derives trimap seeds
    from the cleaned pass-1 mask (eroded core = sure-FG, dilated complement
    = sure-BG) and refines with mask-initialized GrabCut. Measured against
    the reference's shipped PointRend outputs on its sample photos
    (input/{police,toyota}.jpg): IoU 0.786/0.732 vs 0.759/0.665 for the
    single rect pass (tests/test_apps_smoke.py pins the floor).
    """
    import cv2

    # GrabCut's GMM k-means init draws from cv2's process-global RNG; pin it
    # so segmentation is deterministic and independent of call order
    cv2.setRNGSeed(0)
    h, w = img_bgr.shape[:2]
    mask = np.full((h, w), cv2.GC_PR_BGD, np.uint8)
    # central prior: assume the object occupies the middle of the frame
    rect = (int(w * 0.08), int(h * 0.08), int(w * 0.84), int(h * 0.84))
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img_bgr, mask, rect, bgd, fgd, iters, cv2.GC_INIT_WITH_RECT)
    out = np.where(
        (mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD), 255, 0
    ).astype(np.uint8)
    if out.sum() == 0:
        return None
    m1 = _cleanup_mask(out)
    kk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (15, 15))
    sure_fg = cv2.erode(m1, kk)
    sure_bg = cv2.dilate(m1, kk) == 0
    mask2 = np.full((h, w), cv2.GC_PR_FGD, np.uint8)
    mask2[m1 == 0] = cv2.GC_PR_BGD
    mask2[sure_fg > 0] = cv2.GC_FGD
    mask2[sure_bg] = cv2.GC_BGD
    try:
        cv2.grabCut(
            img_bgr, mask2, None, bgd, fgd, 5, cv2.GC_INIT_WITH_MASK
        )
        out2 = np.where(
            (mask2 == cv2.GC_FGD) | (mask2 == cv2.GC_PR_FGD), 255, 0
        ).astype(np.uint8)
        if out2.sum():
            return _cleanup_mask(out2)
    except cv2.error:
        pass  # degenerate trimap (all one class) — keep the pass-1 mask
    return m1


def normalize_image(img_rgb: np.ndarray, mask: np.ndarray, size: int = 128,
                    scale_major: float = 0.8, scale_minor: float = 4.37):
    """Ellipse-fit crop + white composite (reference preproc.py:240-298)."""
    import cv2

    contours, _ = cv2.findContours(
        mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    if not contours:
        return None
    contour = max(contours, key=cv2.contourArea)
    if len(contour) < 5:
        return None
    (cx, cy), axes, _angle = cv2.fitEllipse(contour)
    # cv2 reports (width, height) of the rotated rect, unsorted — the
    # reference sorts (preproc.py:243) before scaling
    minor, major = min(axes), max(axes)
    radius = int(
        np.ceil(max(minor * scale_minor, major * scale_major) / 2.0)
    )
    ccen, rcen = int(round(cx)), int(round(cy))
    x0, y0 = ccen - radius, rcen - radius
    x1, y1 = ccen + radius, rcen + radius
    h, w = img_rgb.shape[:2]
    pad_l, pad_t = max(0, -x0), max(0, -y0)
    pad_r, pad_b = max(0, x1 - w), max(0, y1 - h)
    comp = img_rgb.astype(np.float32)
    m = (mask.astype(np.float32) / 255.0)[..., None]
    comp = comp * m + 255.0 * (1.0 - m)
    comp = np.pad(
        comp, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), constant_values=255.0
    )
    crop = comp[y0 + pad_t : y1 + pad_t, x0 + pad_l : x1 + pad_l]
    out = cv2.resize(crop.astype(np.uint8), (size, size), interpolation=cv2.INTER_AREA)
    return out


def main(argv=None):
    import cv2
    import imageio.v2 as imageio

    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=str, default="raw")
    parser.add_argument("--output", type=str, default="input")
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--coco_class", type=int, default=2, help="car")
    parser.add_argument("--backend", type=str, default="auto",
                        choices=["auto", "pointrend", "grabcut"])
    parser.add_argument("--scale", "-S", type=float, default=4.37,
                        help="bbox scaling rel the fitted ellipse's minor "
                        "axis (reference preproc.py:192-198)")
    parser.add_argument("--major_scale", "-M", type=float, default=0.8,
                        help="bbox scaling rel the fitted ellipse's major "
                        "axis; the larger radius wins "
                        "(reference preproc.py:199-206)")
    parser.add_argument("--const_border", action="store_true",
                        help="accepted for reference-CLI compatibility; "
                        "the normalize output is identical either way "
                        "(the mask pads to 0, so padded pixels composite "
                        "to white regardless of the image border mode — "
                        "reference preproc.py:272-277)")
    args = parser.parse_args(argv)

    if os.path.isdir(args.input):
        paths = sorted(
            p for p in glob.glob(os.path.join(args.input, "*"))
            if p.lower().endswith((".png", ".jpg", ".jpeg"))
            and not p.endswith("_normalize.png")
        )
    else:
        paths = sorted(glob.glob(args.input))
    os.makedirs(args.output, exist_ok=True)

    use_pointrend = args.backend in ("auto", "pointrend")
    if use_pointrend:
        try:
            import detectron2  # noqa: F401
        except ImportError:
            if args.backend == "pointrend":
                raise
            use_pointrend = False
            print("detectron2 unavailable; using GrabCut fallback segmentation")

    for path in paths:
        img = imageio.imread(path)[..., :3]
        bgr = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        mask = (
            _segment_pointrend(bgr, args.coco_class)
            if use_pointrend
            else _segment_grabcut(bgr)
        )
        if mask is None:
            print(f"SKIP {path}: no object found")
            continue
        out = normalize_image(
            img, mask, size=args.size,
            scale_major=args.major_scale, scale_minor=args.scale,
        )
        if out is None:
            print(f"SKIP {path}: degenerate mask")
            continue
        base = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.output, f"{base}_normalize.png")
        imageio.imwrite(out_path, out)
        print("Wrote", out_path)


if __name__ == "__main__":
    main()
