"""End-to-end training: overfit a tiny model on one synthetic object and
assert the loss falls and rendered PSNR rises above a floor (SURVEY §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pixelnerf_tpu.config import load_config
from pixelnerf_tpu.data import RayBatchPipeline, SyntheticSphereDataset
from pixelnerf_tpu.models import make_model
from pixelnerf_tpu.render import RenderConfig, render_rays
from pixelnerf_tpu.train import (
    TrainState,
    load_checkpoint,
    make_render_loss,
    make_train_step,
    save_checkpoint,
)
from pixelnerf_tpu.utils import geometry, metrics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build(d_hidden=64, num_layers=2, n_coarse=20, n_fine=8):
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = d_hidden
    conf["model"]["mlp_fine"] = {"type": "empty"}
    conf["model"]["encoder"]["num_layers"] = num_layers
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=n_coarse, n_fine=n_fine, n_fine_depth=4,
                       white_bkgd=True)
    loss_fn = make_render_loss(conf["loss"])
    return net, cfg, loss_fn, conf


def test_overfit_single_object():
    ds = SyntheticSphereDataset(num_objects=1, num_views=6, image_size=(32, 32))
    pipe = RayBatchPipeline(
        ds, batch_size=1, rays_per_object=512, views=(1,),
        no_bbox_step=10**9, seed=0, prefetch=0,
    )
    net, cfg, loss_fn, conf = _build()
    it = iter(pipe)
    b0 = next(it)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.asarray(b0["images"]), jnp.asarray(b0["poses"]),
        jnp.asarray(b0["focal"]), jnp.zeros((1, 8, 3)), jnp.ones((1, 8, 3)),
    )
    optimizer = optax.adam(2e-3)
    step = make_train_step(net, cfg, optimizer, loss_fn, train_encoder=True)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(160):  # ~1.5 min on CPU; overfits one object clearly
        # (160 not 120: at 120 the held-out PSNR margin was ~2 dB and
        # flipped sign under fusion-order-level numeric noise)
        batch = {k: jnp.asarray(v) for k, v in next(it).items() if k != "step"}
        rng, key = jax.random.split(rng)
        state, m = step(state, batch, key)
        losses.append(float(m["t"]))
    assert np.isfinite(losses).all()
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < 0.6 * early, f"loss did not fall: {early} -> {late}"

    # render a held-out view and check PSNR beats a trivial floor
    d = ds[0]
    src = 0
    target = 3
    variables = state.variables
    enc = net.apply(
        variables, jnp.asarray(d["images"][None, src : src + 1]),
        jnp.asarray(d["poses"][None, src : src + 1]), jnp.asarray(d["focal"]),
        c=jnp.asarray(d["c"][None]), method=net.encode,
    )

    def query_fn(xyz, viewdirs, coarse):
        return net.apply(
            variables, enc, xyz, viewdirs=viewdirs, coarse=coarse, method=net.query
        )

    rays = geometry.gen_rays(
        jnp.asarray(d["poses"][target : target + 1]), 32, 32,
        jnp.asarray(d["focal"]), ds.z_near, ds.z_far, c=jnp.asarray(d["c"]),
    ).reshape(1, -1, 8)
    out = render_rays(query_fn, rays, jax.random.PRNGKey(2), cfg)
    pred = np.asarray(out["coarse"]["rgb"]).reshape(32, 32, 3)
    gt = d["images"][target] * 0.5 + 0.5
    psnr = metrics.psnr(pred, gt)
    # all-white prediction gives ~8-10 dB on this scene; overfit should beat it
    base = metrics.psnr(np.ones_like(gt), gt)
    assert psnr > base + 2.0, f"psnr {psnr:.2f} vs white-floor {base:.2f}"


def test_checkpoint_roundtrip(tmp_path):
    net, cfg, loss_fn, conf = _build()
    ds = SyntheticSphereDataset(num_objects=1, num_views=2, image_size=(16, 16))
    pipe = RayBatchPipeline(ds, batch_size=1, rays_per_object=32, views=(1,), prefetch=0)
    b = next(iter(pipe))
    variables = net.init(
        jax.random.PRNGKey(0), jnp.asarray(b["images"]), jnp.asarray(b["poses"]),
        jnp.asarray(b["focal"]), jnp.zeros((1, 4, 3)), jnp.ones((1, 4, 3)),
    )
    optimizer = optax.adam(1e-4)
    state = TrainState(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]), step=jnp.asarray(17),
    )
    save_checkpoint(str(tmp_path), state)
    # second save exercises the backup path
    save_checkpoint(str(tmp_path), state)
    assert os.path.exists(tmp_path / "train_state.msgpack_backup")
    template = TrainState(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]), step=jnp.asarray(0),
    )
    restored = load_checkpoint(str(tmp_path), template)
    assert restored is not None
    assert int(restored.step) == 17
    a = jax.tree_util.tree_leaves(state.params)
    b2 = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_variables_without_optimizer_template(tmp_path):
    """Eval apps restore params without knowing the optimizer structure
    (regression: a mismatched opt_state template used to silently fall back
    to a random-init model)."""
    from pixelnerf_tpu.train.state import load_variables

    net, cfg, loss_fn, conf = _build()
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3)), jnp.eye(4)[None, None],
        jnp.asarray(20.0), jnp.zeros((1, 4, 3)), jnp.ones((1, 4, 3)),
    )
    optimizer = optax.adam(1e-4)
    state = TrainState(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]), step=jnp.asarray(42),
    )
    save_checkpoint(str(tmp_path), state)
    restored = load_variables(str(tmp_path))
    assert restored is not None
    assert int(np.asarray(restored["step"])) == 42
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(restored["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert "batch_stats" in restored


def test_corrupt_checkpoint_falls_back_to_backup(tmp_path):
    net, cfg, loss_fn, conf = _build()
    variables = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, 16, 16, 3)), jnp.eye(4)[None, None],
        jnp.asarray(20.0), jnp.zeros((1, 4, 3)), jnp.ones((1, 4, 3)),
    )
    optimizer = optax.adam(1e-4)
    state = TrainState(
        params=variables["params"], batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(variables["params"]), step=jnp.asarray(5),
    )
    save_checkpoint(str(tmp_path), state)
    save_checkpoint(str(tmp_path), state)  # creates backup
    # corrupt the primary
    with open(tmp_path / "train_state.msgpack", "wb") as f:
        f.write(b"garbage")
    restored = load_checkpoint(str(tmp_path), state)
    assert restored is not None and int(restored.step) == 5


def test_use_uncertainty_wired_through_config():
    """loss.rgb_fine.use_uncertainty selects the Kendall'17 fine loss
    (reference src/model/loss.py:92) and reads betas from the fine outputs.
    In the reference this flag is a guaranteed TypeError (train.py:209 never
    passes betas); here it works when betas exist and raises a diagnostic
    (not a bare TypeError) when they don't."""
    from pixelnerf_tpu.config import ConfigNode
    from pixelnerf_tpu.train import make_render_loss, rgb_loss_with_uncertainty
    from pixelnerf_tpu.train.loss import rgb_loss

    conf = ConfigNode(
        {"rgb": {"use_l1": False}, "rgb_fine": {"use_uncertainty": True}}
    )
    loss_fn = make_render_loss(conf)
    rng = np.random.default_rng(0)
    rgb_c = jnp.asarray(rng.uniform(0, 1, (2, 16, 3)).astype(np.float32))
    rgb_f = jnp.asarray(rng.uniform(0, 1, (2, 16, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (2, 16, 3)).astype(np.float32))
    betas = jnp.asarray(rng.uniform(0.1, 2.0, (2, 16)).astype(np.float32))

    outputs = {"coarse": {"rgb": rgb_c}, "fine": {"rgb": rgb_f, "betas": betas}}
    loss, parts = loss_fn(outputs, gt)
    expect = rgb_loss(rgb_c, gt) + rgb_loss_with_uncertainty(rgb_f, gt, betas)
    np.testing.assert_allclose(float(loss), float(expect), rtol=1e-6)
    np.testing.assert_allclose(
        float(parts["rf"]), float(rgb_loss_with_uncertainty(rgb_f, gt, betas)),
        rtol=1e-6,
    )

    # betas absent -> diagnostic ValueError, not a bare TypeError
    with pytest.raises(ValueError, match="use_uncertainty"):
        loss_fn({"coarse": {"rgb": rgb_c}, "fine": {"rgb": rgb_f}}, gt)

    # flag unset -> plain MSE on fine, betas ignored even if present
    loss_plain, _ = make_render_loss(ConfigNode())(outputs, gt)
    expect_plain = rgb_loss(rgb_c, gt) + rgb_loss(rgb_f, gt)
    np.testing.assert_allclose(float(loss_plain), float(expect_plain), rtol=1e-6)


@pytest.mark.parametrize("remat", [False, True, "dots", "features"])
def test_remat_policies_same_gradients(remat):
    """Every remat policy of the chunked train render (False / full /
    dots / features — the last saves the checkpoint-named gathered features
    and recomputes only MLP GEMMs) must produce identical losses and
    gradients; remat changes the memory/recompute schedule, never values."""
    net, cfg, loss_fn, conf = _build(n_coarse=8, n_fine=4)
    SB, NS, H, W, R = 1, 1, 16, 16, 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(
        geometry.look_at(np.array([0.0, 0.2, 2.0], np.float32), np.zeros(3))
    )[None, None]
    focal = jnp.asarray(np.float32(1.2 * W))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    rays = geometry.gen_rays(poses[:, 0], W, H, focal, 1.0, 3.0).reshape(SB, -1, 8)
    rays = rays[:, :R]
    rgb_gt = jnp.asarray(rng.uniform(0, 1, (SB, R, 3)).astype(np.float32))
    batch = {
        "images": images, "poses": poses,
        "focal": jnp.full((SB,), float(focal), jnp.float32),
        "c": jnp.full((SB, 2), W / 2.0, jnp.float32),
        "rays": rays, "rgb_gt": rgb_gt,
    }
    optimizer = optax.sgd(1.0)  # param delta == -grad exactly

    def one_step(mode):
        step = make_train_step(
            net, cfg, optimizer, loss_fn, ray_chunk=8, remat=mode
        )
        state = TrainState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})
            ),
            opt_state=optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        new_state, metrics = step(state, dict(batch), jax.random.PRNGKey(0))
        return float(metrics["t"]), jax.device_get(new_state.params)

    loss_ref, params_ref = one_step(False)
    loss, params = one_step(remat)
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_ref)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
