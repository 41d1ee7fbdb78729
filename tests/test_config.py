"""Mini-HOCON parser: loads the shipped reference-style configs."""
import os
import textwrap

import pytest

from pixelnerf_tpu.config import load_config, parse_string

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_basic_types(tmp_path):
    conf = parse_string(
        textwrap.dedent(
            """
            # comment
            a = 1
            b = 2.5
            c = True
            d = false  // trailing comment
            e = hello
            f = "quoted string"
            g = []
            h = [1, 2, 3]
            i = [[100000], [64], [16]]
            block {
                x = 7
                inner {
                    y = -1.5e-2
                }
            }
            """
        )
    )
    assert conf.get_int("a") == 1
    assert conf.get_float("b") == 2.5
    assert conf.get_bool("c") is True
    assert conf.get_bool("d") is False
    assert conf.get_string("e") == "hello"
    assert conf.get_string("f") == "quoted string"
    assert conf.get_list("g") == []
    assert conf.get_list("h") == [1, 2, 3]
    assert conf.get_list("i") == [[100000], [64], [16]]
    assert conf["block"].get_int("x") == 7
    assert conf["block.inner"].get_float("y") == -1.5e-2
    assert conf.get_int("missing", 42) == 42
    with pytest.raises(KeyError):
        conf.get_int("missing")


def test_include_and_merge(tmp_path):
    (tmp_path / "base.conf").write_text(
        "model {\n  use_xyz = True\n  mlp {\n n_blocks = 3\n d_hidden = 512\n }\n}\n"
        "renderer {\n n_coarse = 64\n }\n"
    )
    (tmp_path / "child.conf").write_text(
        'include required("base.conf")\n'
        "model {\n  mlp {\n n_blocks = 5\n combine_layer = 3\n }\n}\n"
    )
    conf = load_config(str(tmp_path / "child.conf"))
    assert conf["model"].get_bool("use_xyz") is True
    assert conf["model.mlp"].get_int("n_blocks") == 5       # overridden
    assert conf["model.mlp"].get_int("d_hidden") == 512      # inherited
    assert conf["model.mlp"].get_int("combine_layer") == 3   # added
    assert conf["renderer"].get_int("n_coarse") == 64


def test_loads_shipped_confs():
    conf_dir = os.path.join(REPO, "conf")
    conf = load_config(os.path.join(conf_dir, "exp", "sn64.conf"))
    # sn64 inherits default_mv -> default; check the full chain resolved
    assert conf["model"].get_bool("use_encoder") is True
    assert conf["model.mlp_coarse"].get_int("combine_layer") == 3
    assert conf["model.encoder"].get_bool("use_first_pool") is False
    assert conf["renderer"].get_int("n_coarse") == 64
    assert conf["renderer"].get_int("n_fine") == 32
    assert conf["model.code"].get_float("freq_factor") == 1.5
    assert conf["data"].get_string("format") == "dvr"


def test_include_later_wins_order(tmp_path):
    """HOCON order: include overrides keys before it; later keys override it."""
    (tmp_path / "base.conf").write_text("a = 1\nblk {\n x = 10\n y = 20\n}\n")
    (tmp_path / "child.conf").write_text(
        "a = 0\n"
        "blk {\n x = 5\n}\n"
        'include required("base.conf")\n'
        "blk {\n y = 99\n}\n"
    )
    conf = load_config(str(tmp_path / "child.conf"))
    assert conf.get_int("a") == 1        # include beats pre-include key
    assert conf["blk"].get_int("x") == 10
    assert conf["blk"].get_int("y") == 99  # post-include key beats include


def test_kv_object_form_merges(tmp_path):
    """HOCON merges duplicate object-valued keys for every syntax form:
    'key = { ... }' after an include must merge into the included subtree,
    not replace it (the reference's conf tree relies on this when a leaf
    conf overrides one nested model key)."""
    (tmp_path / "base.conf").write_text(
        "model {\n use_xyz = true\n mlp {\n d_hidden = 128\n blocks = 5\n}\n}\n"
    )
    (tmp_path / "child.conf").write_text(
        'include required("base.conf")\n'
        "model = {\n mlp = {\n d_hidden = 256\n}\n}\n"
    )
    conf = load_config(str(tmp_path / "child.conf"))
    assert conf["model"].get_bool("use_xyz") is True      # preserved
    assert conf["model.mlp"].get_int("blocks") == 5       # preserved
    assert conf["model.mlp"].get_int("d_hidden") == 256   # overridden
