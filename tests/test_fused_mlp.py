"""Fused Pallas MLP kernel vs the XLA path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelnerf_tpu.models.resnetfc import ResnetFC


def _mlp(dtype=jnp.bfloat16, combine_layer=3, n_blocks=5):
    return ResnetFC(
        d_in=42, d_latent=512, n_blocks=n_blocks, d_hidden=128,
        combine_layer=combine_layer, dtype=dtype,
    )


def test_fast_matches_slow_bf16():
    mlp = _mlp()
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(300, 512)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(300, 42)).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), (z, x))
    slow = mlp.apply(variables, (z, x), combine_inner_dims=(1, 300))
    fast = mlp.apply(variables, (z, x), combine_inner_dims=(1, 300), fast=True)
    assert fast.shape == slow.shape
    # both paths quantize to bf16 per layer; tolerance covers reassociation
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), atol=5e-2, rtol=5e-2
    )
    # and they should be *mostly* bit-close
    frac_close = np.mean(
        np.abs(np.asarray(fast) - np.asarray(slow)) < 1e-2
    )
    assert frac_close > 0.95


def test_fast_falls_back_multiview():
    """NS=2 routes to the XLA path (fusion at combine_layer) and stays exact."""
    mlp = _mlp()
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 42)).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), (z, x))
    out_fast = mlp.apply(variables, (z, x), combine_inner_dims=(2, 4), fast=True)
    out_slow = mlp.apply(variables, (z, x), combine_inner_dims=(2, 4))
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_slow))
    assert out_fast.shape == (1, 4, 4)


def test_fast_falls_back_f32():
    mlp = _mlp(dtype=jnp.float32)
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 42)).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), (z, x))
    out = mlp.apply(variables, (z, x), combine_inner_dims=(1, 8), fast=True)
    ref = mlp.apply(variables, (z, x), combine_inner_dims=(1, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_param_tree_unchanged():
    """The declared-params refactor must keep the checkpoint tree layout."""
    mlp = _mlp()
    z = jnp.zeros((4, 512))
    x = jnp.zeros((4, 42))
    variables = mlp.init(jax.random.PRNGKey(0), (z, x))
    p = variables["params"]
    assert set(p.keys()) == {
        "lin_in", "lin_z_0", "lin_z_1", "lin_z_2",
        "block0", "block1", "block2", "block3", "block4", "lin_out",
    }
    assert set(p["block0"].keys()) == {"fc_0", "fc_1"}
    assert p["block0"]["fc_0"]["kernel"].shape == (128, 128)
    # fc_1 zero-init preserved
    assert float(jnp.abs(p["block3"]["fc_1"]["kernel"]).max()) == 0.0


def test_fast_pretransformed_z():
    """Baked tz (z_pretransformed) through the kernel == XLA unbaked path."""
    mlp = _mlp()
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(300, 512)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(300, 42)).astype(np.float32))
    variables = mlp.init(jax.random.PRNGKey(0), (z, x))
    # bake tz exactly the way bake_encoding does
    p = variables["params"]
    n_lin_z = min(mlp.combine_layer, mlp.n_blocks)
    K = jnp.concatenate(
        [p[f"lin_z_{i}"]["kernel"] for i in range(n_lin_z)], axis=1
    )
    b = jnp.concatenate([p[f"lin_z_{i}"]["bias"] for i in range(n_lin_z)])
    tz = z @ K + b
    slow = mlp.apply(variables, (z, x), combine_inner_dims=(1, 300))
    fast = mlp.apply(
        variables, (tz, x), combine_inner_dims=(1, 300),
        fast=True, z_pretransformed=True,
    )
    assert fast.shape == slow.shape
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(slow), atol=5e-2, rtol=5e-2
    )
