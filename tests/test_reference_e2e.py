"""End-to-end golden test against the ACTUAL reference implementation.

Builds the reference PixelNeRFNet + NeRFRenderer (torch CPU, random weights,
pretrained=False), exports its state_dict, imports it through
``models.torch_import``, and renders identical rays through both stacks with
matched deterministic sampling (uniform -> 0.5, normal -> 0 on both sides).
This validates the WHOLE pipeline — encoder, uv projection, bilinear gather,
conditioned MLP, hierarchical coarse+fine render — against the reference code
itself rather than a re-implemented referee.

Reference: src/model/models.py:146-266, src/render/nerf.py:98-338.
"""
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else -10.0 * np.log10(mse)


@pytest.fixture(scope="module")
def ref_modules():
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference source tree not available")
    # Stub the two external deps of the reference's import graph that this
    # environment lacks. dotmap.DotMap only needs attr-dict + toDict here;
    # pyhocon is imported by util.args but unused on the model/render path.
    if "dotmap" not in sys.modules:
        dm = types.ModuleType("dotmap")

        class DotMap(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

            def toDict(self):
                return dict(self)

        dm.DotMap = DotMap
        sys.modules["dotmap"] = dm
    if "pyhocon" not in sys.modules:
        ph = types.ModuleType("pyhocon")
        ph.ConfigFactory = type("ConfigFactory", (), {})
        sys.modules["pyhocon"] = ph
    import torchvision_stub

    torchvision_stub.install()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import model as ref_model  # noqa: F401  (reference src/model)
    import render.nerf as ref_nerf  # noqa: F401

    return ref_model, ref_nerf


# The config matrix (VERDICT r2 #3): each case is a cheap parameterization
# of the same fixture; each covers a configuration where a sign/convention
# bug could hide (reference src/model/models.py:119-141,146-266,
# src/render/nerf.py:251-338, eval/eval.py:139-148).
E2E_CASES = {
    # the round-2 baseline: sn64, NS=2, SB=1, viewdirs, white_bkgd
    "base": {},
    # DTU-style intrinsics: per-object (SB,2) focal with distinct fx/fy +
    # explicit (SB,2) principal point off the image center + lindisp
    # (reference DVRDataset.py:157-181,231-238 feeding models.py:119-141;
    # eval.py:227-230 passes focal as (1,2))
    "dtu_intrinsics": {"SB": 2, "fxfy": True, "explicit_c": True,
                       "lindisp": True},
    # disparity-space stratified sampling alone (reference nerf.py:109-113)
    "lindisp": {"lindisp": True},
    # coarse-only hierarchy: n_fine=0 -> no fine branch (nerf.py:284-298)
    "coarse_only": {"n_fine": 0},
    # no view directions in the input code (models.py:35-43,184-199)
    "no_viewdirs": {"model_over": {"use_viewdirs": False}},
    # superbatch + 3-view fusion through combine_interleaved
    # (resnetfc.py:151-172)
    "sb2_ns3": {"SB": 2, "NS": 3},
    # the eval --coarse 64/128 conversion: fine MLP dropped, hierarchical
    # sampling kept, both passes through the coarse MLP (eval.py:139-148)
    "coarse_conversion": {"coarse_conv": True},
    # SPADE-style latent modulation x = scale_z(z)*x + lin_z(z) in every
    # pre-combine block (reference resnetfc.py:119-126,174-180)
    "spade": {"model_over": {"mlp_coarse": {"use_spade": True},
                             "mlp_fine": {"use_spade": True}}},
    # global ImageEncoder latent prepended to every MLP input
    # (reference models.py:62-65,229-235, encoder.py:180-241)
    "global_encoder": {
        "model_over": {
            "use_global_encoder": True,
            "global_encoder": {"backbone": "resnet34", "pretrained": False,
                               "latent_size": 128},
        }
    },
}


def _apply_over(node, over):
    """Deep-merge a plain-dict override into a ConfigNode tree."""
    from pixelnerf_tpu.config import ConfigNode

    for k, v in over.items():
        if isinstance(v, dict):
            child = node.get(k)
            if not isinstance(child, dict):
                child = ConfigNode()
                dict.__setitem__(node, k, child)
            _apply_over(child, v)
        else:
            dict.__setitem__(node, k, v)


@pytest.mark.parametrize("case_name", sorted(E2E_CASES))
def test_reference_end_to_end(ref_modules, monkeypatch, case_name):
    import torch

    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.models.torch_import import import_state_dict
    from pixelnerf_tpu.render.renderer import RenderConfig, render_rays
    from pixelnerf_tpu.utils import geometry

    ref_model, ref_nerf = ref_modules
    case = E2E_CASES[case_name]
    SB = case.get("SB", 1)
    NS = case.get("NS", 2)
    lindisp = case.get("lindisp", False)
    coarse_conv = case.get("coarse_conv", False)

    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["encoder"]["pretrained"] = False  # no downloads; random init
    _apply_over(conf["model"], case.get("model_over", {}))
    if case.get("n_fine") is not None:
        conf["renderer"]["n_fine"] = case["n_fine"]
    torch.manual_seed(0)
    ref_net = ref_model.make_model(conf["model"]).eval()

    # Our net from the same conf, weights imported from the reference net.
    net = make_model(conf["model"])
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    variables = import_state_dict(sd)

    H, W, B = 64, 64, 24
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32)
    poses = np.stack(
        [
            np.stack(
                [
                    geometry.look_at(
                        np.array(
                            [0.5 * v - 0.2 + 0.3 * s, 0.3 - 0.2 * s, 2.2],
                            np.float32,
                        ),
                        np.zeros(3),
                    )
                    for v in range(NS)
                ]
            )
            for s in range(SB)
        ]
    ).astype(np.float32)
    if case.get("fxfy"):
        # per-object [fx, fy] with fx != fy (the reference repeats 2-D
        # intrinsics per view in forward, models.py:206-212)
        focal = np.stack(
            [np.array([1.2 * W + 3.0 * s, 1.1 * W - 2.0 * s], np.float32)
             for s in range(SB)]
        )
    else:
        focal = np.float32(1.2 * W)
    c = None
    if case.get("explicit_c"):
        c = np.stack(
            [np.array([0.5 * W + 1.5 - s, 0.5 * H - 2.0 + s], np.float32)
             for s in range(SB)]
        )
    ray_focal = np.float32(1.2 * W)
    rays = np.asarray(
        geometry.gen_rays(
            jnp.asarray(poses[:, 0]), W, H, jnp.asarray(ray_focal), 1.0, 3.4
        )
    ).reshape(SB, -1, 8)[:, :: (H * W) // B][:, :B]

    # Deterministic sampling on BOTH sides: stratified jitter and the
    # importance-sample u's become 0.5, depth jitter becomes 0. The two
    # renderers then draw identical z samples and the comparison is exact
    # up to float32 accumulation.
    monkeypatch.setattr(torch, "rand_like", lambda x: torch.full_like(x, 0.5))
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))

    def fixed_rand(*sizes, **kw):
        dtype = kw.get("dtype") or torch.float32
        return torch.full(tuple(int(s) for s in sizes), 0.5, dtype=dtype)

    monkeypatch.setattr(torch, "rand", fixed_rand)
    monkeypatch.setattr(
        jax.random,
        "uniform",
        lambda key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0: jnp.full(
            shape, 0.5, dtype
        ),
    )
    monkeypatch.setattr(
        jax.random,
        "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )

    # --- reference render -------------------------------------------------
    renderer_ref = ref_nerf.NeRFRenderer.from_conf(
        conf["renderer"], white_bkgd=True, lindisp=lindisp
    )
    if coarse_conv:
        # reference eval.py:139-148
        ref_net.mlp_fine = None
        renderer_ref.n_coarse = 64
        renderer_ref.n_fine = 128
        renderer_ref.using_fine = True
    render_par = renderer_ref.bind_parallel(ref_net, gpus=None)
    images_nchw = torch.from_numpy(images.transpose(0, 1, 4, 2, 3))
    ref_focal = torch.tensor(focal)
    ref_c = None if c is None else torch.tensor(c)
    with torch.no_grad():
        ref_net.encode(
            images_nchw, torch.from_numpy(poses), ref_focal, c=ref_c
        )
        out_ref = render_par(torch.from_numpy(rays), want_weights=True)

    # --- our render ---------------------------------------------------------
    if coarse_conv:
        net = net.clone(mlp_fine=None)
    enc = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        c=None if c is None else jnp.asarray(c), method=net.encode,
    )

    def query_fn(xyz, viewdirs, coarse):
        return net.apply(
            variables, enc, xyz, viewdirs=viewdirs, coarse=coarse, method=net.query
        )

    cfg = RenderConfig.from_conf(conf["renderer"], white_bkgd=True, lindisp=lindisp)
    if coarse_conv:
        import dataclasses

        cfg = dataclasses.replace(cfg, n_coarse=64, n_fine=128)
    out = render_rays(
        query_fn, jnp.asarray(rays), jax.random.PRNGKey(0), cfg,
        train=False, want_weights=True, use_viewdirs=net.use_viewdirs,
    )

    branches = ("coarse", "fine") if cfg.using_fine else ("coarse",)
    for branch in branches:
        rgb_ref = np.asarray(out_ref[branch]["rgb"])
        rgb_ours = np.asarray(out[branch]["rgb"])
        assert rgb_ref.shape == rgb_ours.shape
        psnr = _psnr(rgb_ours, rgb_ref)
        assert psnr > 60.0, f"{branch} rgb PSNR {psnr:.1f} dB vs reference"
        depth_ref = np.asarray(out_ref[branch]["depth"]).reshape(SB, B)
        np.testing.assert_allclose(
            np.asarray(out[branch]["depth"]), depth_ref, atol=2e-3,
            err_msg=f"{branch} depth",
        )
        w_ref = np.asarray(out_ref[branch]["weights"])
        w_ours = np.asarray(out[branch]["weights"])
        # Tie-aware per-element check. The deterministic fixture is
        # degenerate: randn->0 collapses all 16 depth-jitter samples onto
        # the expected depth, and the importance samples can coincide
        # exactly with coarse z's. A 1-ulp torch-vs-JAX difference in
        # those tied z's then flips their sort order, RELOCATING a
        # sample's weight to a different slot of the same ray (observed:
        # the whole 16-sample depth run lands on the other side of a
        # coarse z). rgb/depth/weight-sums above pin the physics; here we
        # additionally require that every above-tolerance discrepancy is
        # such a relocation — the multiset of weight excesses must cancel
        # (same values leave one slot and arrive at another).
        d = w_ours.astype(np.float64) - w_ref.astype(np.float64)
        for ray_idx in np.argwhere(np.any(np.abs(d) > 4e-3, axis=-1)):
            ray_d = d[tuple(ray_idx)]
            ex = ray_d[np.abs(ray_d) > 4e-3]
            pos = np.sort(ex[ex > 0])
            neg = np.sort(-ex[ex < 0])
            assert pos.shape == neg.shape and np.allclose(
                pos, neg, atol=4e-3
            ), (
                f"{branch} weights of ray {tuple(ray_idx)} differ beyond a "
                f"sort-tie relocation: +{pos} vs -{neg}; ray diff "
                f"{np.array2string(ray_d, precision=4, threshold=200)}"
            )
        np.testing.assert_allclose(
            w_ours.sum(-1), w_ref.sum(-1), atol=2e-3,
            err_msg=f"{branch} weight sums",
        )
