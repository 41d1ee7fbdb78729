"""calc_metrics parity: multicat metadata categories, viewlist/-P/DTU view
exclusion, report format, and the JAX-LPIPS wiring (reference
eval/calc_metrics.py:30-97,118-340)."""
import os

import numpy as np
import pytest
import torch

from pixelnerf_tpu.apps import calc_metrics


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(arr, 0, 1) * 255).astype(np.uint8))


@pytest.fixture
def fixture_tree(tmp_path):
    """Two-category DVR-style dataset + renders; render of view 1 of the
    airplane object is garbage so view exclusion is observable."""
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    out = tmp_path / "renders"
    (data / "_meta").mkdir(parents=True)  # underscore dir must be ignored
    (tmp_path / "renders").mkdir()
    import json

    meta = {
        "02691156": {"name": "airplane,aeroplane,plane"},
        "02958343": {"name": "car,auto,automobile"},
    }
    (data / "metadata.yaml").write_text(json.dumps(meta))
    gt_views = {}
    for cat, obj in [("02691156", "obj1"), ("02958343", "objA")]:
        im_dir = data / cat / obj / "image"
        im_dir.mkdir(parents=True)
        (data / cat / "softras_test.lst").write_text(obj + "\n")
        rend_dir = out / f"{cat}_{obj}"
        rend_dir.mkdir()
        for v in range(3):
            gt = rng.uniform(0, 1, (32, 32, 3))
            gt_views[(cat, obj, v)] = gt
            _write_png(str(im_dir / f"{v:04}.png"), gt)
            pred = gt + rng.normal(0, 0.01, gt.shape)  # near-perfect render
            if cat == "02691156" and v == 1:
                pred = 1.0 - gt  # garbage render for the excluded view
            _write_png(str(rend_dir / f"{v:06}.png"), pred)
    return data, out


def _args(data, out, *extra):
    return ["-D", str(data), "-O", str(out), "-F", "dvr", "--multicat", *extra]


def test_map_reduce_with_viewlist_exclusion(fixture_tree, tmp_path, capsys):
    data, out = fixture_tree
    viewlist = tmp_path / "src_test.txt"
    viewlist.write_text("02691156 obj1 1\n")
    calc_metrics.main(_args(data, out, "-L", str(viewlist)))
    txt = (out / "02691156_obj1" / "metrics.txt").read_text()
    metrics = dict(
        (line.split()[0], float(line.split()[1])) for line in txt.splitlines()
    )
    assert metrics["psnr"] > 35  # garbage view excluded
    # report format: per-category rows with metadata names + total
    report = (out / "all_metrics.txt").read_text()
    assert "airplane" in report and "car" in report
    assert "n_inst: 1" in report
    assert report.splitlines()[-1].startswith("total")
    assert "lpips" not in report  # no weights passed


def test_map_without_exclusion_sees_garbage_view(fixture_tree):
    data, out = fixture_tree
    calc_metrics.main(_args(data, out))
    txt = (out / "02691156_obj1" / "metrics.txt").read_text()
    psnr = float(txt.splitlines()[0].split()[1])
    assert psnr < 32  # garbage view included drags the mean down


def test_primary_and_dtu_excludes(fixture_tree):
    data, out = fixture_tree
    # view 1 excluded via -P; metrics must match the viewlist-based run
    calc_metrics.main(_args(data, out, "-P", "1"))
    psnr = float(
        (out / "02691156_obj1" / "metrics.txt").read_text().splitlines()[0].split()[1]
    )
    assert psnr > 35
    assert calc_metrics.DTU_BAD_VIEWS == [
        3, 4, 5, 6, 7, 16, 17, 18, 19, 20, 21, 36, 37, 38, 39,
    ]


def test_lpips_wiring(fixture_tree, tmp_path):
    from test_lpips import _random_torch_state_dict

    data, out = fixture_tree
    weights = tmp_path / "vgg_lpips.pth"
    torch.save(_random_torch_state_dict(seed=5), str(weights))
    calc_metrics.main(
        _args(data, out, "--lpips_weights", str(weights), "--overwrite")
    )
    txt = (out / "02958343_objA" / "metrics.txt").read_text()
    metrics = dict(
        (line.split()[0], float(line.split()[1])) for line in txt.splitlines()
    )
    assert "lpips" in metrics and metrics["lpips"] >= 0
    report = (out / "all_metrics.txt").read_text()
    assert "lpips:" in report


def test_reduce_tolerates_legacy_bookkeeping_rows(fixture_tree):
    """metrics.txt files from older writers carry an 'n <count>' row;
    reduce must skip unknown rows instead of crashing (KeyError)."""
    data, out = fixture_tree
    calc_metrics.main(_args(data, out))
    for d in out.iterdir():
        mpath = d / "metrics.txt"
        if mpath.exists():
            mpath.write_text(mpath.read_text() + "\nn 3")
    calc_metrics.main(_args(data, out, "--reduce_only"))
    report = (out / "all_metrics.txt").read_text()
    assert report.splitlines()[-1].startswith("total")


def test_lpips_skip_is_loud(fixture_tree, capsys):
    """Without --lpips_weights the omission of the reference's third headline
    metric must be announced, and --require_lpips must hard-error."""
    data, out = fixture_tree
    calc_metrics.main(_args(data, out, "--overwrite"))
    captured = capsys.readouterr()
    assert "LPIPS is SKIPPED" in captured.out or "LPIPS is SKIPPED" in captured.err

    with pytest.raises(SystemExit, match="require_lpips"):
        calc_metrics.main(_args(data, out, "--overwrite", "--require_lpips"))
