"""HOCON parser robustness: generated nested configs round-trip."""
import numpy as np

from pixelnerf_tpu.config import parse_string


def _gen_conf(rng, depth=0):
    lines = []
    expected = {}
    n = rng.integers(2, 5)
    for i in range(n):
        kind = rng.integers(0, 5 if depth < 2 else 4)
        key = f"k{depth}_{i}"
        if kind == 0:
            v = int(rng.integers(-1000, 1000))
            lines.append(f"{key} = {v}")
            expected[key] = v
        elif kind == 1:
            v = float(np.round(rng.normal(), 4))
            lines.append(f"{key} = {v}")
            expected[key] = v
        elif kind == 2:
            v = bool(rng.integers(0, 2))
            lines.append(f"{key} = {v}  # comment")
            expected[key] = v
        elif kind == 3:
            v = [int(x) for x in rng.integers(0, 9, size=3)]
            lines.append(f"{key} = {v}")
            expected[key] = v
        else:
            sub_lines, sub_expected = _gen_conf(rng, depth + 1)
            lines.append(f"{key} {{")
            lines.extend("    " + l for l in sub_lines)
            lines.append("}")
            expected[key] = sub_expected
    return lines, expected


def _check(node, expected):
    for k, v in expected.items():
        if isinstance(v, dict):
            _check(node[k], v)
        else:
            got = node[k]
            if isinstance(v, float):
                assert abs(got - v) < 1e-9, (k, got, v)
            else:
                assert got == v, (k, got, v)


def test_fuzz_roundtrip():
    for seed in range(25):
        rng = np.random.default_rng(seed)
        lines, expected = _gen_conf(rng)
        conf = parse_string("\n".join(lines))
        _check(conf, expected)


def test_weird_but_valid():
    conf = parse_string(
        "a = -1.5e-3\n"
        "b = hello_world  // trailing\n"
        "c = []\n"
        "d = [[1, 2], [3]]\n"
        "e = \"quoted # not comment\"\n"
        "f = 1e10\n"
    )
    assert conf["a"] == -1.5e-3
    assert conf["b"] == "hello_world"
    assert conf["c"] == []
    assert conf["d"] == [[1, 2], [3]]
    assert conf["e"] == "quoted # not comment"
    assert conf["f"] == 1e10
