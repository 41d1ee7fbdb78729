"""JAX VGG-LPIPS vs an independent torch referee + invariants.

The referee reproduces the lpips package's published algorithm (scaling
layer, VGG16 taps, unit-normalize, squared diff, 1x1 lin heads, spatial
mean, sum) with torch functional ops, driven by the SAME weights through the
torch-format state_dict importer. Reference metric use:
eval/calc_metrics.py:186.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pixelnerf_tpu.utils.lpips import (
    LPIPS,
    _SCALE,
    _SHIFT,
    _VGG_PLAN,
    _VGG_WIDTHS,
    import_lpips_state_dict,
    init_lpips_params,
    lpips_distance,
)


def _random_torch_state_dict(seed=0, full_lpips_format=False):
    """Random VGG+lin weights in torchvision naming (features.<idx>.*) or the
    lpips package's full naming (net.slice<k>.<idx>.*)."""
    rng = np.random.default_rng(seed)
    sd = {}
    c_in = 3
    for gi, (group, width) in enumerate(zip(_VGG_PLAN, _VGG_WIDTHS)):
        for idx in group:
            prefix = (
                f"net.slice{gi + 1}.{idx}" if full_lpips_format else f"features.{idx}"
            )
            sd[f"{prefix}.weight"] = torch.tensor(
                rng.normal(0, 0.05, (width, c_in, 3, 3)).astype(np.float32)
            )
            sd[f"{prefix}.bias"] = torch.tensor(
                rng.normal(0, 0.01, (width,)).astype(np.float32)
            )
            c_in = width
        sd[f"lin{gi}.model.1.weight"] = torch.tensor(
            np.abs(rng.normal(0, 0.05, (1, width, 1, 1))).astype(np.float32)
        )
    if full_lpips_format:
        sd["scaling_layer.shift"] = torch.tensor(_SHIFT.reshape(1, 3, 1, 1))
        sd["scaling_layer.scale"] = torch.tensor(_SCALE.reshape(1, 3, 1, 1))
    return sd


def _torch_lpips_referee(sd, img0_nhwc, img1_nhwc):
    """lpips algorithm in torch functional ops from the flat state_dict."""
    shift = torch.tensor(_SHIFT.reshape(1, 3, 1, 1))
    scale = torch.tensor(_SCALE.reshape(1, 3, 1, 1))

    def taps(x_nhwc):
        x = torch.tensor(x_nhwc).permute(0, 3, 1, 2)
        x = (x - shift) / scale
        outs = []
        for gi, group in enumerate(_VGG_PLAN):
            if gi > 0:
                x = F.max_pool2d(x, 2, 2)
            for idx in group:
                key = (
                    f"features.{idx}"
                    if f"features.{idx}.weight" in sd
                    else f"net.slice{gi + 1}.{idx}"
                )
                x = F.relu(F.conv2d(x, sd[f"{key}.weight"], sd[f"{key}.bias"], padding=1))
            outs.append(x)
        return outs

    with torch.no_grad():
        t0, t1 = taps(img0_nhwc), taps(img1_nhwc)
        total = 0.0
        for gi, (a, b) in enumerate(zip(t0, t1)):
            na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            diff = (na - nb) ** 2
            w = sd[f"lin{gi}.model.1.weight"]
            val = F.conv2d(diff, w)                       # (B, 1, H, W)
            total = total + val.mean(dim=(2, 3)).squeeze(1)
        return total.numpy()


@pytest.mark.parametrize("full_format", [False, True])
def test_lpips_matches_torch_referee(full_format):
    sd = _random_torch_state_dict(seed=1, full_lpips_format=full_format)
    params = import_lpips_state_dict(sd)
    rng = np.random.default_rng(2)
    img0 = rng.uniform(-1, 1, (2, 35, 37, 3)).astype(np.float32)  # odd dims
    img1 = rng.uniform(-1, 1, (2, 35, 37, 3)).astype(np.float32)
    ours = np.asarray(lpips_distance(params, img0, img1))
    ref = _torch_lpips_referee(sd, img0, img1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-6)


def test_lpips_invariants():
    params = init_lpips_params(np.random.default_rng(0))
    lp = LPIPS(params)
    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    assert abs(float(lp(a, a)[0])) < 1e-6          # identity -> 0
    d_ab, d_ba = float(lp(a, b)[0]), float(lp(b, a)[0])
    assert d_ab > 0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-5)  # symmetric
    # small perturbations score closer than unrelated images
    eps = (a + 0.01 * rng.normal(size=a.shape)).astype(np.float32)
    assert float(lp(a, eps)[0]) < d_ab


def test_lpips_matches_recorded_package_outputs():
    """Pin utils/lpips.py to the REAL lpips package's recorded outputs
    (closes the shared-misconception risk the in-repo referee leaves open).
    Auto-unskips when the networked-env artifacts exist — see
    scripts/record_lpips_golden.py for the one-command recording recipe."""
    import hashlib
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fixture = os.path.join(root, "tests", "fixtures", "lpips_golden.npz")
    weights = os.path.join(root, "weights", "lpips_vgg.pth")
    if not os.path.exists(fixture) or not os.path.exists(weights):
        pytest.skip(
            "recorded lpips fixture/weights absent (network-gated): run "
            "scripts/fetch_lpips_weights.py + scripts/record_lpips_golden.py"
        )
    sys.path.insert(0, os.path.join(root, "scripts"))
    from record_lpips_golden import golden_inputs, inputs_digest

    rec = np.load(fixture)
    pairs = golden_inputs()
    # prove we regenerated the exact pixels the recorder scored
    assert inputs_digest(pairs) == str(rec["inputs_sha256"])
    with open(weights, "rb") as f:
        assert hashlib.sha256(f.read()).hexdigest() == str(rec["weights_sha256"]), \
            "weights file differs from the one the fixture was recorded with"

    lp = LPIPS.from_torch_file(weights)
    ours = np.concatenate([np.asarray(lp(a, b)).reshape(-1) for a, b in pairs])
    np.testing.assert_allclose(ours, rec["dists"], rtol=1e-4, atol=1e-6)


def test_lpips_matches_committed_referee_fixture():
    """Committed deterministic golden (VERDICT r4 #7): the torch referee's
    outputs for numpy-deterministic weights/inputs were recorded ONCE and
    committed (tests/fixtures/lpips_referee_golden.npz, 1 KB), so this
    comparison no longer depends on torch being importable — the only open
    question left on LPIPS is the real package weights (network-gated
    fixture above)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rec = np.load(
        os.path.join(root, "tests", "fixtures", "lpips_referee_golden.npz")
    )
    rng = np.random.default_rng(int(rec["img_seed"]))
    shape = tuple(rec["shape"])
    img0 = rng.uniform(-1, 1, shape).astype(np.float32)
    img1 = rng.uniform(-1, 1, shape).astype(np.float32)
    for seed, fmt in ((1, False), (7, True)):
        sd = _random_torch_state_dict(seed=seed, full_lpips_format=fmt)
        params = import_lpips_state_dict(sd)
        ours = np.asarray(lpips_distance(params, img0, img1))
        np.testing.assert_allclose(
            ours, rec[f"ref_seed{seed}_full{int(fmt)}"], rtol=2e-4, atol=2e-6
        )


def test_lpips_bf16_drift():
    """bf16-activations LPIPS must stay within a small relative drift of the
    f32 result — the dtype the TPU metric path may run in."""
    import jax.numpy as jnp
    import jax.tree_util as jtu

    sd = _random_torch_state_dict(seed=1)
    params = import_lpips_state_dict(sd)
    rng = np.random.default_rng(2)
    img0 = rng.uniform(-1, 1, (2, 35, 37, 3)).astype(np.float32)
    img1 = rng.uniform(-1, 1, (2, 35, 37, 3)).astype(np.float32)
    f32 = np.asarray(lpips_distance(params, img0, img1), np.float64)
    params_bf = jtu.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x,
        params,
    )
    bf = np.asarray(
        lpips_distance(
            params_bf, jnp.asarray(img0, jnp.bfloat16),
            jnp.asarray(img1, jnp.bfloat16),
        ),
        np.float64,
    )
    rel = float(np.max(np.abs(bf - f32) / np.maximum(np.abs(f32), 1e-9)))
    print(f"lpips bf16 drift: rel={rel:.3e} f32={f32} bf16={bf}")
    assert rel < 0.05, f"bf16 LPIPS drifts {rel:.3e} from f32"


def test_lpips_import_rejects_incomplete():
    sd = _random_torch_state_dict(seed=1)
    sd.pop("lin2.model.1.weight")
    with pytest.raises(ValueError):
        import_lpips_state_dict(sd)


def test_lpips_import_ignores_torchvision_classifier():
    sd = _random_torch_state_dict(seed=1)
    sd["classifier.0.weight"] = torch.zeros(16, 25088)
    sd["classifier.0.bias"] = torch.zeros(16)
    params = import_lpips_state_dict(sd)
    assert params["convs"][0][0]["kernel"].shape == (3, 3, 3, 64)
