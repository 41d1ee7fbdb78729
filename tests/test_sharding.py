"""Multi-device sharding: sharded render must match single-device render
(ray sharding is communication-free, jax PRNG is layout-invariant)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.config import load_config
from pixelnerf_tpu.models import make_model
from pixelnerf_tpu.parallel import make_mesh, make_sharded_render, shard_batch
from pixelnerf_tpu.parallel.render import shard_rays
from pixelnerf_tpu.render import RenderConfig
from pixelnerf_tpu.utils import geometry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

requires_8dev = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(SB=2, NS=2, H=16, W=16):
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 32
    conf["model"]["mlp_fine"]["d_hidden"] = 32
    conf["model"]["encoder"]["num_layers"] = 2
    net = make_model(conf["model"])
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32)
    poses = np.stack(
        [
            np.stack([geometry.look_at(np.array([0.3 * i, 0.2, 2.0]), np.zeros(3))
                      for i in range(NS)])
            for _ in range(SB)
        ]
    ).astype(np.float32)
    focal = np.float32(20.0)
    variables = net.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(poses),
        jnp.asarray(focal), jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    enc = net.apply(
        variables, jnp.asarray(images), jnp.asarray(poses), jnp.asarray(focal),
        method=net.encode,
    )
    cam = geometry.gen_rays(jnp.asarray(poses[:, 0]), 16, 16, focal, 1.0, 3.0)
    rays = cam.reshape(SB, -1, 8)  # (SB, 256, 8)
    return net, variables, enc, rays


@requires_8dev
def test_mesh_shapes():
    m = make_mesh()
    assert m.shape == {"data": 1, "ray": 8}
    m2 = make_mesh(data=4)
    assert m2.shape == {"data": 4, "ray": 2}


@requires_8dev
def test_sharded_render_matches_single_device():
    net, variables, enc, rays = _setup()
    cfg = RenderConfig(n_coarse=16, n_fine=8, n_fine_depth=4)
    key = jax.random.PRNGKey(7)

    # single device reference
    from pixelnerf_tpu.render import render_rays

    def query_fn(xyz, viewdirs, coarse):
        return net.apply(
            variables, enc, xyz, viewdirs=viewdirs, coarse=coarse, method=net.query
        )

    ref = render_rays(query_fn, rays, key, cfg, use_viewdirs=True)

    for mesh in (make_mesh(), make_mesh(data=4), make_mesh(data=2)):
        render = make_sharded_render(net, cfg, mesh)
        out = render(variables, enc, shard_rays(mesh, rays), key)
        for phase in ("coarse", "fine"):
            np.testing.assert_allclose(
                np.asarray(out[phase]["rgb"]), np.asarray(ref[phase]["rgb"]),
                atol=1e-5, err_msg=f"{mesh.shape} {phase}",
            )
            np.testing.assert_allclose(
                np.asarray(out[phase]["depth"]), np.asarray(ref[phase]["depth"]),
                atol=1e-5,
            )


@requires_8dev
def test_shard_batch_placement():
    mesh = make_mesh(data=2)
    batch = {
        "rays": np.zeros((2, 64, 8), np.float32),
        "images": np.zeros((2, 3, 8, 8, 3), np.float32),
        "focal": np.zeros((2,), np.float32),
        "scalar": np.float32(1.0),
    }
    placed = shard_batch(mesh, batch)
    assert placed["rays"].sharding.spec == ("data", "ray")
    assert placed["images"].sharding.spec == ("data",)
    # NS=3 indivisible by ray axis -> second-dim sharding skipped
    assert placed["focal"].sharding.spec == ("data",)


@requires_8dev
def test_sharded_train_step_gradients_match_single_device():
    """The psum gradient path: one lr=1.0 SGD step on the mesh and on one
    device from identical state — the param delta IS the gradient, so
    comparing updated params certifies the full backward + all-reduce
    (SURVEY §2.2; the render-equality tests above only cover forward)."""
    import optax

    from pixelnerf_tpu.config import ConfigNode
    from pixelnerf_tpu.train import TrainState, make_render_loss, make_train_step

    net, variables, enc, rays = _setup(SB=4)
    cfg = RenderConfig(n_coarse=8, n_fine=4, n_fine_depth=2, white_bkgd=True)
    loss_fn = make_render_loss(ConfigNode())
    sgd = optax.sgd(1.0)

    rng = np.random.default_rng(1)
    SB, R = 4, 32
    host_batch = {
        "images": rng.uniform(-1, 1, (SB, 2, 16, 16, 3)).astype(np.float32),
        "poses": np.stack(
            [
                np.stack(
                    [geometry.look_at(np.array([0.3 * i, 0.2, 2.0]), np.zeros(3))
                     for i in range(2)]
                )
                for _ in range(SB)
            ]
        ).astype(np.float32),
        "focal": np.full((SB,), 20.0, np.float32),
        "c": np.full((SB, 2), 8.0, np.float32),
        "rays": np.asarray(rays[:SB, :R]),
        "rgb_gt": rng.uniform(0, 1, (SB, R, 3)).astype(np.float32),
    }

    def fresh_state():
        return TrainState(
            params=jax.tree_util.tree_map(jnp.array, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.array, variables.get("batch_stats", {})
            ),
            opt_state=sgd.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    step_1d = make_train_step(net, cfg, sgd, loss_fn, mesh=None)
    st_ref, m_ref = step_1d(
        fresh_state(), {k: jnp.asarray(v) for k, v in host_batch.items()},
        jax.random.PRNGKey(3),
    )

    for mesh in (make_mesh(), make_mesh(data=2), make_mesh(data=4)):
        step_sh = make_train_step(net, cfg, sgd, loss_fn, mesh=mesh)
        st_sh, m_sh = step_sh(
            fresh_state(), shard_batch(mesh, host_batch), jax.random.PRNGKey(3)
        )
        assert abs(float(m_sh["t"]) - float(m_ref["t"])) < 1e-5
        assert abs(float(m_sh["gnorm"]) - float(m_ref["gnorm"])) < 1e-4
        for a, b in zip(
            jax.tree_util.tree_leaves(st_sh.params),
            jax.tree_util.tree_leaves(st_ref.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )
