#!/usr/bin/env python
"""Fetch the reference's released pretrained checkpoints (networked envs).

The pixel-nerf authors distribute all pretrained weights as one zip on
Google Drive (reference README.md:55-57: "download all pretrained weight
files", extract to ``<project>/checkpoints/`` so that e.g.
``checkpoints/dtu/pixel_nerf_latest`` exists). This script performs that
download with stdlib urllib only (no gdown dependency), extracts into
``checkpoints/``, and writes ``checkpoints/MANIFEST.json`` with the sha256 of
every extracted file so later runs can verify integrity.

Once the files exist, two things unlock automatically:
  * ``tests/test_pretrained_parity.py`` stops skipping and cross-checks the
    REAL released weights through our torch importer against the reference
    code path (the strongest offline parity instrument becomes a real-weight
    one).
  * ``apps/eval`` / ``apps/calc_metrics`` can reproduce BASELINE.md's
    headline numbers (SRN-car / DTU PSNR) with ``-n srn_car`` etc. after
    converting with ``models.torch_import.load_torch_checkpoint``.

Zero-egress environments: this script fails fast with a clear message; the
gated test keeps skipping. That is expected — see PARITY.md "checkpoint
parity" for what is and is not provable offline.
"""
from __future__ import annotations

import argparse
import hashlib
import io
import json
import os
import re
import sys
import urllib.parse
import urllib.request
import zipfile

# reference README.md:55-57 — "all pretrained weight files" bundle
PRETRAINED_DRIVE_ID = "1UO_rL201guN6euoWkCOn-XpqR2e8o6ju"

# expnames the bundle is documented to contain (reference README.md:146-153)
EXPECTED = ["sn64", "sn64_unseen", "srn_chair", "srn_car", "dtu"]

_UA = {"User-Agent": "Mozilla/5.0 (pixelnerf-tpu fetch_pretrained)"}


def _drive_download(file_id: str, timeout: float = 120.0) -> bytes:
    """Download a (possibly large) Google Drive file via the usercontent
    endpoint, handling the can't-scan-for-viruses confirm interstitial."""
    url = (
        "https://drive.usercontent.google.com/download?"
        + urllib.parse.urlencode({"id": file_id, "export": "download",
                                  "confirm": "t"})
    )
    req = urllib.request.Request(url, headers=_UA)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        data = resp.read()
        ctype = resp.headers.get("Content-Type", "")
    if b"PK\x03\x04" == data[:4]:
        return data
    if "text/html" in ctype:
        # interstitial form: re-submit with the embedded hidden fields
        html = data.decode("utf-8", "replace")
        fields = dict(
            re.findall(r'name="([^"]+)"\s+value="([^"]*)"', html)
        )
        action = re.search(r'action="([^"]+)"', html)
        if action and fields:
            url2 = action.group(1) + "?" + urllib.parse.urlencode(fields)
            req2 = urllib.request.Request(url2, headers=_UA)
            with urllib.request.urlopen(req2, timeout=timeout) as resp2:
                data = resp2.read()
            if data[:4] == b"PK\x03\x04":
                return data
    raise RuntimeError(
        "Google Drive did not return a zip (got %r...). The file may require "
        "interactive consent; download manually from "
        "https://drive.google.com/file/d/%s/view and extract into "
        "checkpoints/." % (data[:64], file_id)
    )


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main(argv=None) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=os.path.join(repo, "checkpoints"))
    ap.add_argument("--file_id", default=PRETRAINED_DRIVE_ID)
    ap.add_argument(
        "--zip", default=None,
        help="path to an already-downloaded pretrained bundle zip "
        "(skips the network entirely)",
    )
    args = ap.parse_args(argv)

    if args.zip:
        with open(args.zip, "rb") as f:
            blob = f.read()
    else:
        print(f"downloading Drive file {args.file_id} ...", flush=True)
        try:
            blob = _drive_download(args.file_id)
        except Exception as e:  # zero-egress environments land here
            print(
                f"FETCH FAILED: {e}\n"
                "If this environment has no network access, download the "
                "bundle elsewhere and re-run with --zip <path>.",
                file=sys.stderr,
            )
            return 2
        print(f"downloaded {len(blob) / 1e6:.1f} MB", flush=True)

    os.makedirs(args.out, exist_ok=True)
    manifest = {}
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            # the bundle nests under checkpoints/ in some releases; normalize
            rel = info.filename
            if rel.startswith("checkpoints/"):
                rel = rel[len("checkpoints/"):]
            if not rel:
                continue
            dest = os.path.join(args.out, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with zf.open(info) as src, open(dest, "wb") as dst:
                dst.write(src.read())
            manifest[rel] = _sha256(dest)
            print(f"  {rel}  sha256={manifest[rel][:16]}…")

    with open(os.path.join(args.out, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)

    missing = [
        n for n in EXPECTED
        if not os.path.isfile(os.path.join(args.out, n, "pixel_nerf_latest"))
    ]
    if missing:
        print(f"WARNING: expected expnames missing from bundle: {missing}",
              file=sys.stderr)
        return 1
    print(
        "OK — all expected checkpoints present. Run "
        "`python -m pytest tests/test_pretrained_parity.py -v` to certify "
        "real-weight parity."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
