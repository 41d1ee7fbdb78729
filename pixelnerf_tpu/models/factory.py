"""String-keyed model construction from config trees.

Counterpart of reference src/model/model_util.py + src/model/__init__.py:
``make_mlp`` (mlp | resnet | empty), ``make_encoder`` (spatial | global),
``make_model`` (pixelnerf). The reference's ``type = mlp`` branch has a latent
NameError (model_util.py:8); here ImplicitNet is wired up properly.
"""
from __future__ import annotations

from typing import Optional

from ..config import ConfigNode
from .code import PositionalEncoding
from .encoder import ImageEncoder, SpatialEncoder
from .mlp import ImplicitNet
from .pixelnerf import PixelNeRFNet
from .resnetfc import ResnetFC


def make_mlp(conf, d_in: int, d_latent: int = 0, allow_empty: bool = False, **kwargs):
    mlp_type = conf.get_string("type", "mlp")
    if mlp_type == "mlp":
        return ImplicitNet.from_conf(conf, d_in + d_latent, **kwargs)
    if mlp_type == "resnet":
        return ResnetFC.from_conf(conf, d_in, d_latent=d_latent, **kwargs)
    if mlp_type == "empty" and allow_empty:
        return None
    raise NotImplementedError(f"Unsupported MLP type {mlp_type}")


def make_encoder(conf, **kwargs):
    enc_type = conf.get_string("type", "spatial")
    if enc_type == "spatial":
        return SpatialEncoder.from_conf(conf, **kwargs)
    if enc_type == "global":
        return ImageEncoder.from_conf(conf, **kwargs)
    raise NotImplementedError(f"Unsupported encoder type {enc_type}")


def make_model(conf, stop_encoder_grad: bool = False) -> PixelNeRFNet:
    """Build a PixelNeRFNet from a 'model' config subtree.

    Mirrors the flag plumbing of reference models.py:16-87 (d_in/d_latent
    computation included), producing an unbound flax module.
    """
    model_type = conf.get_string("type", "pixelnerf")
    if model_type != "pixelnerf":
        raise NotImplementedError(f"Unsupported model type {model_type}")

    # model-level compute dtype (bfloat16 for MXU throughput, float32 for
    # strict checkpoint parity) pushed into encoder/mlp subtrees as a default
    dtype = conf.get("dtype", None)
    if dtype is not None:
        for sub in ("encoder", "mlp_coarse", "mlp_fine", "global_encoder"):
            subconf = conf.get(sub)
            if isinstance(subconf, dict):
                subconf.setdefault("dtype", dtype)

    use_encoder = conf.get_bool("use_encoder", True)
    use_xyz = conf.get_bool("use_xyz", False)
    assert use_encoder or use_xyz
    use_code = conf.get_bool("use_code", False)
    use_code_viewdirs = conf.get_bool("use_code_viewdirs", True)
    use_viewdirs = conf.get_bool("use_viewdirs", False)
    use_global_encoder = conf.get_bool("use_global_encoder", False)

    encoder = make_encoder(conf.get_config("encoder", ConfigNode()))
    global_encoder: Optional[ImageEncoder] = (
        ImageEncoder.from_conf(conf.get_config("global_encoder", ConfigNode()))
        if use_global_encoder
        else None
    )

    d_in = 3 if use_xyz else 1
    if use_viewdirs and use_code_viewdirs:
        d_in += 3
    code: Optional[PositionalEncoding] = None
    if use_code and d_in > 0:
        code = PositionalEncoding.from_conf(
            conf.get_config("code", ConfigNode()), d_in=d_in
        )
        d_in = code.d_out
    if use_viewdirs and not use_code_viewdirs:
        d_in += 3

    d_latent = encoder.latent_size if use_encoder else 0
    if global_encoder is not None:
        d_latent += global_encoder.latent_size

    mlp_coarse = make_mlp(conf.get_config("mlp_coarse", ConfigNode()), d_in, d_latent)
    mlp_fine = make_mlp(
        conf.get_config("mlp_fine", ConfigNode({"type": "empty"})),
        d_in,
        d_latent,
        allow_empty=True,
    )
    import jax.numpy as jnp

    return PixelNeRFNet(
        encoder=encoder,
        mlp_coarse=mlp_coarse,
        mlp_fine=mlp_fine,
        code=code,
        global_encoder=global_encoder,
        use_encoder=use_encoder,
        use_xyz=use_xyz,
        normalize_z=conf.get_bool("normalize_z", True),
        use_code_viewdirs=use_code_viewdirs,
        use_viewdirs=use_viewdirs,
        stop_encoder_grad=stop_encoder_grad,
        latent_dtype=jnp.dtype(dtype) if dtype is not None else jnp.float32,
        quad_gather=conf.get_bool("quad_gather", False),
    )
