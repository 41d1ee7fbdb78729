"""SpatialEncoder / ResNet trunk vs torch referee built from our params."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.encoder import ConvEncoder, SpatialEncoder, index_latent
from torch_ref import torch_spatial_encoder


def _init_encoder(num_layers=4, use_first_pool=True, H=32, W=32, seed=0):
    enc = SpatialEncoder(num_layers=num_layers, use_first_pool=use_first_pool)
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(2, H, W, 3)).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(seed), jnp.asarray(x))
    # randomize batch stats so eval-mode BN actually exercises running stats
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            np.random.default_rng(1).uniform(0.5, 1.5, v.shape).astype(np.float32)
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    return enc, variables, x


@pytest.mark.parametrize("use_first_pool", [True, False])
def test_spatial_encoder_matches_torch(use_first_pool):
    enc, variables, x = _init_encoder(use_first_pool=use_first_pool)
    ours = np.asarray(enc.apply(variables, jnp.asarray(x)))  # NHWC
    ref = torch_spatial_encoder(variables, x, 4, use_first_pool).numpy()
    assert ours.shape == (2, ref.shape[2], ref.shape[3], ref.shape[1])
    np.testing.assert_allclose(
        ours.transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=1e-4
    )


def test_latent_size():
    for n, sz in [(2, 128), (3, 256), (4, 512)]:
        assert SpatialEncoder(num_layers=n).latent_size == sz


def test_train_mode_uses_batch_stats():
    enc, variables, x = _init_encoder()
    out_eval = enc.apply(variables, jnp.asarray(x), train=False)
    out_train, mutated = enc.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    # train-mode BN output differs from eval-mode, and running stats moved
    assert float(jnp.abs(out_train - out_eval).max()) > 1e-3
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        mutated["batch_stats"], variables["batch_stats"],
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 1e-6


def test_index_latent_matches_reference_scaling():
    """uv in original-image pixels -> latent grid sample with the
    size/(size-1)*2 align-corners scaling (encoder.py:161-163, 98-99)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    latent = rng.normal(size=(1, 16, 16, 8)).astype(np.float32)
    uv = rng.uniform(0, 64, size=(1, 40, 2)).astype(np.float32)
    image_shape = np.array([64.0, 64.0], np.float32)  # (W, H)

    ours = np.asarray(index_latent(latent, uv, image_shape))

    lat_t = torch.tensor(latent).permute(0, 3, 1, 2)
    scaling = torch.tensor([16.0 / 15.0 * 2.0, 16.0 / 15.0 * 2.0])
    scale = scaling / torch.tensor(image_shape)
    grid = (torch.tensor(uv) * scale - 1.0).unsqueeze(2)
    ref = F.grid_sample(
        lat_t, grid, align_corners=True, mode="bilinear", padding_mode="border"
    )[..., 0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_conv_encoder_runs():
    enc = ConvEncoder()
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(variables, x)
    assert out.shape[0] == 1 and out.shape[-1] == 128
    assert out.shape[1] >= 32 and out.shape[2] >= 32
