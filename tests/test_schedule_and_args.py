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
