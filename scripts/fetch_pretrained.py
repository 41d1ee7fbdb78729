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


def _drive_download(file_id: str, dest_path: str, timeout: float = 120.0):
    """Stream a (possibly large) Google Drive file to ``dest_path`` via the
    usercontent endpoint, handling the can't-scan-for-viruses confirm
    interstitial. Streaming (shutil.copyfileobj) keeps memory flat for the
    multi-GB weights bundle."""
    import shutil

    url = (
        "https://drive.usercontent.google.com/download?"
        + urllib.parse.urlencode({"id": file_id, "export": "download",
                                  "confirm": "t"})
    )

    def fetch(u):
        req = urllib.request.Request(u, headers=_UA)
        resp = urllib.request.urlopen(req, timeout=timeout)
        head = resp.read(4)
        if head == b"PK\x03\x04":
            with open(dest_path, "wb") as f:
                f.write(head)
                shutil.copyfileobj(resp, f, 1 << 20)
            return None
        return head + resp.read()  # small HTML interstitial / error body

    data = fetch(url)
    if data is None:
        return
    # interstitial form: re-submit with the embedded hidden fields
    html = data.decode("utf-8", "replace")
    fields = dict(re.findall(r'name="([^"]+)"\s+value="([^"]*)"', html))
    action = re.search(r'action="([^"]+)"', html)
    if action and fields:
        data = fetch(action.group(1) + "?" + urllib.parse.urlencode(fields))
        if data is None:
            return
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

    import shutil
    import tempfile

    tmp_zip = None
    if args.zip:
        zip_path = args.zip
    else:
        print(f"downloading Drive file {args.file_id} ...", flush=True)
        tmp_zip = tempfile.NamedTemporaryFile(suffix=".zip", delete=False)
        tmp_zip.close()
        zip_path = tmp_zip.name
        try:
            _drive_download(args.file_id, zip_path)
        except Exception as e:  # zero-egress environments land here
            os.unlink(zip_path)
            print(
                f"FETCH FAILED: {e}\n"
                "If this environment has no network access, download the "
                "bundle elsewhere and re-run with --zip <path>.",
                file=sys.stderr,
            )
            return 2
        print(f"downloaded {os.path.getsize(zip_path) / 1e6:.1f} MB",
              flush=True)

    out_root = os.path.realpath(args.out)
    os.makedirs(out_root, exist_ok=True)
    manifest = {}
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            # the bundle nests under checkpoints/ in some releases; normalize
            rel = info.filename
            if rel.startswith("checkpoints/"):
                rel = rel[len("checkpoints/"):]
            if not rel:
                continue
            dest = os.path.realpath(os.path.join(out_root, rel))
            # zip-slip guard: refuse entries escaping the output directory
            if not dest.startswith(out_root + os.sep):
                print(f"  SKIPPING unsafe zip entry {info.filename!r}",
                      file=sys.stderr)
                continue
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with zf.open(info) as src, open(dest, "wb") as dst:
                shutil.copyfileobj(src, dst, 1 << 20)
            manifest[rel] = _sha256(dest)
            print(f"  {rel}  sha256={manifest[rel][:16]}…")
    if tmp_zip is not None:
        os.unlink(zip_path)

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
