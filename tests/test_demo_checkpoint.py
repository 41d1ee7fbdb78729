"""The committed demo checkpoint loads and renders a real scene.

The reference's first-run workflow is download-weights -> run eval
(reference README.md:85-120); with egress blocked, this repo commits an
in-env-trained demo checkpoint (`demo/srn_demo/train_state.msgpack`,
bf16 params, optimizer state stripped — scripts/export_demo_checkpoint.py)
so eval/gen_video run out of the box against the built-in synthetic
dataset (the checkpoint's training distribution — no downloads). This
test exercises that load path (the same structure-free `load_variables`
every eval app uses) and asserts the render is (a) conditioned on the
source views and (b) closer to the target than a degenerate render.
Full-app quality for the same checkpoint is recorded in
`results/demo_checkpoint.json` at export time; here a ::4-subsampled
target view keeps the CPU cost test-suite friendly.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_DIR = os.path.join(REPO, "demo", "srn_demo")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(DEMO_DIR, "train_state.msgpack")),
    reason="demo checkpoint not present",
)
def test_demo_checkpoint_loads_and_renders():
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.data.synthetic import SyntheticSphereDataset
    from pixelnerf_tpu.eval.common import FullRenderer
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render import RenderConfig
    from pixelnerf_tpu.train.state import load_variables
    from pixelnerf_tpu.utils import geometry, metrics

    conf = load_config(os.path.join(REPO, "conf", "exp", "srn.conf"))
    conf["model"]["dtype"] = "bfloat16"  # the recommended inference dtype
    net = make_model(conf["model"])

    variables = load_variables(DEMO_DIR)
    assert variables is not None, "committed checkpoint failed to decode"
    step = int(np.asarray(variables.pop("step", 0)))
    assert step > 1000, f"demo checkpoint barely trained (step {step})"

    # unseen test scenes from the demo's exact training distribution
    # (apps.train -F synthetic, data.num_objects=1024 at 128^2)
    dset = SyntheticSphereDataset(
        num_objects=1024, num_views=12, image_size=(128, 128), stage="test",
        seed=0,
    )
    d = dset[0]
    srcs = [0, 6]
    images = jnp.asarray(d["images"][None, srcs])
    poses = jnp.asarray(d["poses"][None, srcs])
    focal = jnp.asarray(d["focal"])
    enc = net.apply(variables, images, poses, focal, method=net.encode)

    # every 4th pixel of target view 1: full-frame coverage, CPU-cheap
    t = 1
    H = W = 128
    rays = np.asarray(geometry.gen_rays(
        jnp.asarray(d["poses"][t : t + 1]), W, H, focal,
        dset.z_near, dset.z_far,
    ))[0][::4, ::4].reshape(1, -1, 8)
    gt = (d["images"][t, ::4, ::4] * 0.5 + 0.5).astype(np.float32)

    cfg = RenderConfig.from_conf(conf.get("renderer") or {})
    fr = FullRenderer(net, cfg, ray_chunk=1024)

    def render(encoding):
        out = fr.render_batch(variables, encoding, rays, jax.random.PRNGKey(0))
        branch = out["fine"] if cfg.using_fine else out["coarse"]
        return np.clip(
            np.asarray(branch["rgb"], np.float32), 0, 1
        ).reshape(32, 32, 3)

    rgb = render(enc)
    assert np.isfinite(rgb).all()
    assert rgb.std() > 0.05, f"degenerate render (std {rgb.std():.4f})"

    # beats the best constant render of the target by a clear margin
    const = np.full_like(gt, gt.mean(axis=(0, 1), keepdims=True))
    psnr = float(metrics.psnr(rgb, gt))
    psnr_const = float(metrics.psnr(const, gt))
    assert psnr > psnr_const + 2.0, (
        f"demo render {psnr:.2f} dB vs constant baseline {psnr_const:.2f} dB"
    )

    # pixel-conditioned: swapping in a different object's source views must
    # change the render materially
    d2 = dset[5]
    enc2 = net.apply(
        variables, jnp.asarray(d2["images"][None, srcs]),
        jnp.asarray(d2["poses"][None, srcs]), focal, method=net.encode,
    )
    rgb2 = render(enc2)
    assert np.abs(rgb - rgb2).max() > 0.1, "render ignores conditioning"
