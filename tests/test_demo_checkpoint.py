"""The committed demo checkpoint loads and renders a real scene.

The reference's first-run workflow is download-weights -> run eval
(reference README.md:85-120); with egress blocked, this repo commits an
in-env-trained demo checkpoint (`demo/srn_demo/train_state.msgpack`,
bf16 params, optimizer state stripped — scripts/export_demo_checkpoint.py)
so eval/gen_video/eval_real run out of the box. This test exercises that
load path (the same structure-free `load_variables` every eval app
uses) and asserts the render is conditioned on the inputs rather than
degenerate. Full-app quality numbers for the same checkpoint are in
`results/demo_checkpoint.json` (recorded on-chip at export time); here
a center-crop of one target view keeps the CPU cost test-suite friendly.
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

    # unseen scenes matching the demo's training distribution: the seed-0
    # synthetic generator equals the seed-0 SRN-layout disk set the demo
    # trained on (scripts/make_real_layout_fixtures.py --seed 0)
    dset = SyntheticSphereDataset(
        num_objects=1024, num_views=12, image_size=(128, 128), stage="test",
        seed=0,
    )
    d = dset[0]
    images = jnp.asarray(d["images"][None, :1])  # condition on view 0
    poses = jnp.asarray(d["poses"][None, :1])
    focal = jnp.asarray(d["focal"])
    enc = net.apply(variables, images, poses, focal, method=net.encode)

    # a 32x32 center crop of target view 3: enough rays to carry scene
    # structure, small enough for CPU
    t = 3
    H = W = 128
    rays = np.asarray(geometry.gen_rays(
        jnp.asarray(d["poses"][t : t + 1]), W, H, focal,
        dset.z_near, dset.z_far,
    ))[0]  # (H, W, 8)
    sl = slice(48, 80)
    crop_rays = rays[sl, sl].reshape(1, -1, 8)
    cfg = RenderConfig.from_conf(conf.get("renderer") or {})
    fr = FullRenderer(net, cfg, ray_chunk=1024)
    out = fr.render_batch(variables, enc, crop_rays, jax.random.PRNGKey(0))
    branch = out["fine"] if cfg.using_fine else out["coarse"]
    rgb = np.clip(np.asarray(branch["rgb"], np.float32), 0, 1).reshape(32, 32, 3)
    gt = (d["images"][t, sl, sl] * 0.5 + 0.5).astype(np.float32)

    assert np.isfinite(rgb).all()
    # conditioned + non-degenerate: the crop contains the object, so a
    # constant render scores poorly and has ~zero variance
    assert rgb.std() > 0.05, f"degenerate render (std {rgb.std():.4f})"
    psnr = metrics.psnr(rgb, gt)
    assert psnr > 12.0, f"demo checkpoint renders poorly: {psnr:.2f} dB"
