"""ResnetFC wiring vs independent numpy referee; init statistics."""
import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.models.resnetfc import ResnetFC
from torch_ref import numpy_resnetfc


def _make(d_in=42, d_latent=512, n_blocks=5, combine_layer=3, d_hidden=64):
    mlp = ResnetFC(
        d_in=d_in, d_latent=d_latent, n_blocks=n_blocks,
        combine_layer=combine_layer, d_hidden=d_hidden,
    )
    rng = np.random.default_rng(0)
    zx = rng.normal(size=(12, d_latent + d_in)).astype(np.float32)
    variables = mlp.init(jax.random.PRNGKey(0), jnp.asarray(zx))
    return mlp, variables, zx


def test_matches_referee_multiview():
    mlp, variables, zx = _make()
    # 12 rows = SB=2 * NS=2 * B=3
    ours = np.asarray(mlp.apply(variables, jnp.asarray(zx), combine_inner_dims=(2, 3)))
    ref = numpy_resnetfc(
        variables["params"], zx, combine_inner_dims=(2, 3),
        d_latent=512, d_in=42, n_blocks=5, combine_layer=3,
    )
    assert ours.shape == (2, 3, 4)
    np.testing.assert_allclose(ours.reshape(ref.shape), ref, atol=1e-4)


def test_matches_referee_single_view():
    mlp, variables, zx = _make(combine_layer=1000)
    ours = np.asarray(mlp.apply(variables, jnp.asarray(zx), combine_inner_dims=(1,)))
    ref = numpy_resnetfc(
        variables["params"], zx, combine_inner_dims=(1,),
        d_latent=512, d_in=42, n_blocks=5, combine_layer=1000,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_zero_init_second_layer():
    """fc_1 zero-init: at init each block is an identity + latent injection."""
    _, variables, _ = _make()
    for blk in range(5):
        fc1 = variables["params"][f"block{blk}"]["fc_1"]["kernel"]
        assert float(jnp.abs(fc1).max()) == 0.0


def test_kaiming_init_scale():
    mlp = ResnetFC(d_in=256, d_latent=0, n_blocks=2, d_hidden=256)
    variables = mlp.init(jax.random.PRNGKey(1), jnp.zeros((4, 256)))
    k = np.asarray(variables["params"]["lin_in"]["kernel"])
    # kaiming fan_in normal: std = sqrt(2 / 256) = 0.0884
    assert abs(k.std() - np.sqrt(2.0 / 256)) < 0.01


def test_identical_views_collapse():
    """If every view carries identical features, NS=2 equals NS=1 output."""
    mlp, variables, zx = _make()
    single = zx[:6]  # (SB*1*B rows)
    doubled = np.repeat(single.reshape(2, 1, 3, -1), 2, axis=1).reshape(12, -1)
    out1 = np.asarray(
        mlp.apply(variables, jnp.asarray(doubled), combine_inner_dims=(2, 3))
    )
    out2 = np.asarray(
        mlp.apply(variables, jnp.asarray(single), combine_inner_dims=(1, 3))
    )
    np.testing.assert_allclose(out1, out2.reshape(out1.shape), atol=1e-5)


def test_softplus_beta():
    mlp = ResnetFC(d_in=8, d_latent=0, n_blocks=1, d_hidden=16, beta=100.0)
    variables = mlp.init(jax.random.PRNGKey(2), jnp.zeros((4, 8)))
    out = mlp.apply(variables, jnp.ones((4, 8)))
    assert np.all(np.isfinite(np.asarray(out)))
