"""Render schedule stepping + CLI config overrides + multi-obj generator."""
import os
import subprocess
import sys

import numpy as np

from pixelnerf_tpu.apps.args import parse_args
from pixelnerf_tpu.render.renderer import RenderConfig, RenderSchedule

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_schedule_steps():
    base = RenderConfig(n_coarse=64, n_fine=32)
    sched = RenderSchedule(base, [[1000, 5000], [96, 128], [48, 64]])
    assert sched.at_step(0) == base
    c1 = sched.at_step(1000)
    assert (c1.n_coarse, c1.n_fine) == (96, 48)
    c2 = sched.at_step(99999)
    assert (c2.n_coarse, c2.n_fine) == (128, 64)
    # empty schedule is inert
    assert RenderSchedule(base, []).at_step(10**6) == base


def test_override_flag():
    args, conf = parse_args(
        argv=[
            "-c", os.path.join(REPO, "conf", "exp", "sn64.conf"),
            "--override", "model.mlp_coarse.d_hidden=64",
            "--override", "renderer.n_coarse=16",
            "--override", "model.encoder.use_first_pool=True",
            "--override", "train.brand_new_key=1.5",
        ]
    )
    assert conf["model.mlp_coarse"].get_int("d_hidden") == 64
    assert conf["renderer"].get_int("n_coarse") == 16
    assert conf["model.encoder"].get_bool("use_first_pool") is True
    assert conf["train"].get_float("brand_new_key") == 1.5
    # untouched keys survive
    assert conf["model"].get_bool("use_xyz") is True


def test_expconf_name_lookup():
    args, conf = parse_args(argv=["-n", "sn64"])
    assert args.conf.endswith("conf/exp/sn64.conf")
    assert args.dataset_format == "dvr"


def test_multi_obj_generator(tmp_path):
    out = tmp_path / "mo"
    script = os.path.join(REPO, "scripts", "make_multi_obj_dataset.py")
    subprocess.run(
        [sys.executable, script, "--out", str(out), "--scenes", "3",
         "--views", "4", "--size", "24"],
        check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True,
    )
    from pixelnerf_tpu.data import MultiObjectDataset

    ds = MultiObjectDataset(str(out), stage="train")
    assert len(ds) >= 1
    d = ds[0]
    assert d["images"].shape == (4, 24, 24, 3)
    assert d["poses"].shape == (4, 4, 4)
    assert np.isfinite(d["images"]).all()


def test_genlist_unseen_category_splits(tmp_path):
    """scripts/genlist.py reconstructs the gen_*.lst files the authors ship
    with the NMR download (reference README.md:33,149): seen categories
    (airplane/car/chair) keep their softras train/val splits for training,
    unseen categories get gen_test.lst from the shipped eval viewlist —
    and the dvr_gen adapter consumes the result."""
    data = tmp_path / "NMR_Dataset"
    for cat, objs in [
        ("02691156", ["a1", "a2", "a3"]),   # airplane: seen
        ("02828884", ["b1", "b2"]),         # bench: unseen
    ]:
        d = data / cat
        d.mkdir(parents=True)
        (d / "softras_train.lst").write_text("\n".join(objs) + "\n")
        (d / "softras_val.lst").write_text(objs[0] + "\n")
        (d / "softras_test.lst").write_text("\n".join(objs) + "\n")
    vl = tmp_path / "src_gen.txt"
    vl.write_text("02828884 b1 3\n02828884 b2 7\n")
    script = os.path.join(REPO, "scripts", "genlist.py")
    subprocess.run(
        [sys.executable, script, "--data", str(data), "--viewlist", str(vl)],
        check=True, capture_output=True,
    )
    assert (data / "02691156" / "gen_train.lst").read_text().split() == [
        "a1", "a2", "a3"
    ]
    assert (data / "02691156" / "gen_test.lst").read_text() == ""
    assert (data / "02828884" / "gen_train.lst").read_text() == ""
    assert (data / "02828884" / "gen_test.lst").read_text().split() == [
        "b1", "b2"
    ]

    from pixelnerf_tpu.data.dvr import DVRDataset

    train = DVRDataset(str(data), stage="train", list_prefix="gen_")
    test = DVRDataset(str(data), stage="test", list_prefix="gen_")
    assert len(train.all_objs) == 3 and len(test.all_objs) == 2
    assert all(cat == "02691156" for cat, _ in train.all_objs)
    assert all(cat == "02828884" for cat, _ in test.all_objs)
