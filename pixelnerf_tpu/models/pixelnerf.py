"""The conditional radiance field — functional-core pixelNeRF.

Rebuild of the reference's PixelNeRFNet (src/model/models.py). The stateful
two-phase API (``encode`` caches buffers, ``forward`` reads them; reference
models.py:89-144, 146-266) becomes:

- ``encode(images, poses, focal, c) -> SceneEncoding`` — an explicit PyTree
  holding the pixel-aligned feature maps, inverted world->camera poses and
  normalized intrinsics; and
- ``query(encoding, xyz, viewdirs, coarse) -> (SB, B, 4)`` rgb+sigma.

Conventions preserved bit-for-bit for checkpoint parity: fy negated at encode
(models.py:130), projection ``uv = -xy/z * f + c`` (models.py:206-212),
canonical-frame z feature from the rotation-only transform (models.py:171),
multi-view fusion through the MLP's combine_inner_dims (models.py:245).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..utils.geometry import invert_pose, repeat_interleave
from .code import PositionalEncoding
from .encoder import ImageEncoder, SpatialEncoder, index_latent


@flax.struct.dataclass
class SceneEncoding:
    """Everything ``query`` needs about the conditioning views.

    Replaces the reference's persistent=False module buffers
    (models.py:76-84) with an explicit, shardable PyTree.
    """

    latent: jax.Array                 # (SB*NS, Hl, Wl, C) pixel-aligned features
    poses: jax.Array                  # (SB*NS, 3, 4) world->camera
    focal: jax.Array                  # (SB, 2) [fx, -fy]
    c: jax.Array                      # (SB, 2) principal point
    image_shape: jax.Array            # (2,) [W, H] of the encoded images
    num_views: int = flax.struct.field(pytree_node=False, default=1)
    global_latent: Optional[jax.Array] = None   # (SB*NS, G) if use_global_encoder
    latent_quad: Optional[jax.Array] = None     # (SB*NS, Hl, Wl, 4C) corner map
    # Baked latent injections (see bake_encoding): the MLP's lin_z GEMM
    # applied to the feature map at encode time, (SB*NS, Hl, Wl, n_lin_z*dh).
    tz_coarse: Optional[jax.Array] = None
    tz_fine: Optional[jax.Array] = None
    # LR-packed int32 feature rows (SB*NS, Hl*Wl, C) for the fused
    # gather+MLP kernel (see pack_encoding / ops/fused_field.py).
    latent_packed: Optional[jax.Array] = None


def _normalize_intrinsic(v, batch: int, name: str, num_views: int = 1) -> jax.Array:
    """Broadcast focal/c to (SB, 2) — or keep per-view (SB*NS, 2) inputs
    (reference encode also accepts per-view intrinsics; models.py:119-141).

    1-D precedence (shape is all jit can branch on): a length-2 vector at
    SB == 1 is an (fx, fy) pair (what DTU-style adapters emit); any other
    1-D input is per-entry scalars f_i -> (f_i, f_i), the reference's
    documented semantics. At SB == 2 a (2,) input therefore means two
    per-object scalars, NOT (fx, fy) — pass shape (SB, 2) to be explicit."""
    v = jnp.asarray(v, dtype=jnp.float32)
    if v.ndim == 0:
        v = jnp.full((batch, 2), v)
    elif v.ndim == 1 and batch == 1 and v.shape[0] == 2:
        # unbatched (fx, fy) vector (DTU-style datasets) — unambiguous at
        # SB=1, so accept it the way the reference's repeat_interleave
        # broadcasting does (models.py:119-141)
        v = v[None]
    elif v.ndim == 1:
        v = jnp.broadcast_to(v[:, None], (v.shape[0], 2))
    if v.shape[0] == 1 and batch > 1:
        v = jnp.broadcast_to(v, (batch, 2))
    ok_shapes = {(batch, 2), (batch * num_views, 2)}
    assert v.shape in ok_shapes, (
        f"{name} must broadcast to (SB, 2) or per-view (SB*NS, 2), got {v.shape}"
    )
    return v


class PixelNeRFNet(nn.Module):
    """Conditional NeRF: CNN-encoded source views condition a residual MLP."""

    encoder: SpatialEncoder
    mlp_coarse: nn.Module
    mlp_fine: Optional[nn.Module] = None
    code: Optional[PositionalEncoding] = None
    global_encoder: Optional[ImageEncoder] = None
    use_encoder: bool = True
    use_xyz: bool = False
    normalize_z: bool = True
    use_code_viewdirs: bool = True
    use_viewdirs: bool = False
    stop_encoder_grad: bool = False
    latent_dtype: Any = jnp.float32  # storage dtype of the cached feature map
    # Precompute the 4-corner feature map so each query is ONE gather.
    # Measured ~1.5x faster for the isolated gather but a wash end-to-end on
    # v5e (the wider rows repay the saved indices in lerp bandwidth), so off
    # by default; kept as a config switch for larger latents / other chips.
    quad_gather: bool = False

    @property
    def use_code(self) -> bool:
        return self.code is not None

    @property
    def use_global_encoder(self) -> bool:
        return self.global_encoder is not None

    @property
    def d_in(self) -> int:
        """Spatial-code width feeding the MLP (reference models.py:49-60)."""
        d_in = 3 if self.use_xyz else 1
        if self.use_viewdirs and self.use_code_viewdirs:
            d_in += 3
        if self.use_code and d_in > 0:
            d_in = self.code.d_out
        if self.use_viewdirs and not self.use_code_viewdirs:
            d_in += 3
        return d_in

    @property
    def d_latent(self) -> int:
        d = self.encoder.latent_size if self.use_encoder else 0
        if self.use_global_encoder:
            d += self.global_encoder.latent_size
        return d

    def __call__(self, images, poses, focal, xyz, viewdirs=None, c=None):
        """init/trace convenience: encode then query."""
        enc = self.encode(images, poses, focal, c=c)
        out = self.query(enc, xyz, viewdirs=viewdirs, coarse=True)
        if self.mlp_fine is not None:
            out = self.query(enc, xyz, viewdirs=viewdirs, coarse=False)
        return out

    def encode(
        self,
        images: jax.Array,
        poses: jax.Array,
        focal: Any,
        c: Any = None,
        train: bool = False,
    ) -> SceneEncoding:
        """Encode source views into a :class:`SceneEncoding`.

        :param images: (SB, NS, H, W, 3) in [-1, 1] (NHWC; the reference is
            NCHW) — SB objects, NS source views each
        :param poses: (SB, NS, 4, 4) camera-to-world
        :param focal: scalar, (SB,), or (SB, 2) [fx, fy]
        :param c: principal point, same formats; default = image center
        """
        SB, NS, H, W, _ = images.shape
        images_flat = images.reshape(SB * NS, H, W, 3)
        latent = (
            self.encoder(images_flat, train=train) if self.use_encoder else None
        )
        latent_quad = None
        if latent is not None:
            # bf16 storage halves the pixel-aligned gather's HBM traffic in
            # the render hot loop; interpolation still upcasts to f32
            latent = latent.astype(self.latent_dtype)
            if (
                self.quad_gather
                and self.encoder.index_interp == "bilinear"
                and self.encoder.index_padding == "border"
            ):
                from ..ops.grid_sample import build_quad_features

                latent_quad = build_quad_features(latent)
        w2c = invert_pose(poses.reshape(SB * NS, 4, 4))
        image_shape = jnp.array([W, H], dtype=jnp.float32)

        focal = _normalize_intrinsic(focal, SB, "focal", NS)
        focal = focal * jnp.array([1.0, -1.0])  # image y is down (models.py:130)
        if c is None:
            c = jnp.broadcast_to(image_shape * 0.5, (SB, 2))
        else:
            c = _normalize_intrinsic(c, SB, "c", NS)

        global_latent = (
            self.global_encoder(images_flat, train=train)
            if self.use_global_encoder
            else None
        )
        return SceneEncoding(
            latent=latent,
            poses=w2c,
            focal=focal,
            c=c,
            image_shape=image_shape,
            num_views=NS,
            global_latent=global_latent,
            latent_quad=latent_quad,
        )

    def query(
        self,
        enc: SceneEncoding,
        xyz: jax.Array,
        viewdirs: Optional[jax.Array] = None,
        coarse: bool = True,
        fast: bool = False,
    ) -> jax.Array:
        """Predict (r, g, b, sigma) at world points.

        :param xyz: (SB, B, 3) world-space query points
        :param viewdirs: (SB, B, 3) world-space view directions
        :return: (SB, B, 4) — sigmoid(rgb), relu(sigma)
        """
        feats = self.query_features(enc, xyz, viewdirs=viewdirs, coarse=coarse)
        return self.query_mlp(enc, feats, coarse=coarse, fast=fast)

    def _point_inputs(self, enc: SceneEncoding, xyz, viewdirs):
        """Camera transform + spatial code + uv projection — the per-point
        precompute shared by :meth:`query_features` and :meth:`query_fused`.

        :return: (z_feature (SB*NS, B, d_in) or None,
                  uv (SB*NS, B, 2) pixel coords or None)
        """
        SB, B, _ = xyz.shape
        NS = enc.num_views

        xyz_rep = repeat_interleave(xyz, NS)                       # (SB*NS, B, 3)
        rot = enc.poses[:, :3, :3]
        xyz_rot = jnp.einsum("nij,nbj->nbi", rot, xyz_rep)
        xyz_cam = xyz_rot + enc.poses[:, None, :3, 3]

        d_in = self.d_in
        z_feature = None
        if d_in > 0:
            if self.use_xyz:
                z_feature = xyz_rot if self.normalize_z else xyz_cam
                z_feature = z_feature.reshape(SB * NS, B, 3)
            else:
                z_feature = -(xyz_rot if self.normalize_z else xyz_cam)[..., 2:3]

            if self.use_code and not self.use_code_viewdirs:
                z_feature = self.code(z_feature)

            if self.use_viewdirs:
                assert viewdirs is not None
                vdirs = repeat_interleave(viewdirs, NS)            # (SB*NS, B, 3)
                vdirs = jnp.einsum("nij,nbj->nbi", rot, vdirs)
                z_feature = jnp.concatenate([z_feature, vdirs], axis=-1)

            if self.use_code and self.use_code_viewdirs:
                z_feature = self.code(z_feature)
            z_feature = z_feature.reshape(SB * NS, B, d_in)

        uv = None
        if self.use_encoder:
            uv = -xyz_cam[..., :2] / xyz_cam[..., 2:3]             # (SB*NS, B, 2)
            # intrinsics may already be per-view (SB*NS, 2)
            focal = (
                enc.focal
                if enc.focal.shape[0] == SB * NS
                else repeat_interleave(enc.focal, NS)
            )
            cc = enc.c if enc.c.shape[0] == SB * NS else repeat_interleave(enc.c, NS)
            uv = uv * focal[:, None, :] + cc[:, None, :]
        return z_feature, uv

    def query_features(
        self,
        enc: SceneEncoding,
        xyz: jax.Array,
        viewdirs: Optional[jax.Array] = None,
        coarse: bool = True,
    ):
        """The per-point *feature* stage of ``query``: camera transform,
        uv projection, pixel-aligned gather, positional code. Split out so
        the renderer's staged path can reuse coarse-sample features in the
        fine pass (the gather is the non-GEMM hot op; reference
        src/model/encoder.py:102-108). ``coarse`` only matters for baked
        encodings (per-MLP tz maps).

        :return: (latent, z_feature) tuple of (SB*NS, B, D) arrays (either
            may be None), consumable by :meth:`query_mlp`.
        """
        z_feature, uv = self._point_inputs(enc, xyz, viewdirs)
        latent = None
        if self.use_encoder:
            tz_map = None
            if enc.tz_coarse is not None and self.global_encoder is None:
                tz_map = (
                    enc.tz_coarse
                    if (coarse or self.mlp_fine is None)
                    else enc.tz_fine
                )
            if tz_map is not None:
                # baked path: the gather returns the latent injections
                # directly (wz GEMM folded into the map; bake_encoding)
                latent = index_latent(
                    tz_map,
                    uv,
                    enc.image_shape,
                    self.encoder.index_interp,
                    self.encoder.index_padding,
                )
            elif enc.latent_quad is not None:
                from ..models.encoder import latent_scaling
                from ..ops.grid_sample import grid_sample_quad

                scale = (
                    latent_scaling(enc.latent.shape[1], enc.latent.shape[2])
                    / enc.image_shape
                )
                latent = grid_sample_quad(enc.latent_quad, uv * scale - 1.0)
            else:
                latent = index_latent(
                    enc.latent,
                    uv,
                    enc.image_shape,
                    self.encoder.index_interp,
                    self.encoder.index_padding,
                )                                                  # (SB*NS, B, C)
            if self.stop_encoder_grad:
                latent = jax.lax.stop_gradient(latent)
            if self.use_global_encoder:
                glob = ImageEncoder.index(enc.global_latent, latent.shape[1])  # (SB*NS, B, G)
                latent = jnp.concatenate([glob, latent], axis=-1)
        # emit in the MLP's compute dtype: ResnetFC casts its inputs anyway,
        # so this is value-identical but halves the staged path's feature
        # materialization traffic under bf16
        dt = getattr(self.mlp_coarse, "dtype", None)
        if dt is not None:
            latent = latent.astype(dt) if latent is not None else None
            z_feature = z_feature.astype(dt) if z_feature is not None else None
        return latent, z_feature

    def query_mlp(
        self,
        enc: SceneEncoding,
        feats,
        coarse: bool = True,
        fast: bool = False,
    ) -> jax.Array:
        """The *field MLP* stage of ``query``: run the (coarse or fine)
        conditioned MLP on precomputed features and apply the output heads.

        :param feats: (latent, z_feature) from :meth:`query_features`
        :return: (SB, B, 4) — sigmoid(rgb), relu(sigma)
        """
        latent, z_feature = feats
        NS = enc.num_views
        lead = latent if latent is not None else z_feature
        B = lead.shape[1]
        SB = lead.shape[0] // NS
        # baked tz maps make the gathered latent pre-transformed (z @ Wz + b)
        z_pre = (
            latent is not None
            and enc.tz_coarse is not None
            and self.global_encoder is None
        )
        if latent is not None:
            # pass (z, x) unconcatenated — ResnetFC fuses the latent
            # injections into one GEMM and never materializes the concat
            mlp_input = (latent, z_feature) if z_feature is not None else latent
        else:
            mlp_input = z_feature

        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) else self.mlp_fine
        kw = {"z_pretransformed": True} if z_pre else {}
        out = mlp(mlp_input, combine_inner_dims=(NS, B), fast=fast, **kw)  # (SB, B, 4)
        out = out.reshape(SB, B, 4)
        rgb = nn.sigmoid(out[..., :3])
        sigma = nn.relu(out[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1)

    def query_fused(
        self,
        enc: SceneEncoding,
        xyz: jax.Array,
        viewdirs: Optional[jax.Array] = None,
        coarse: bool = True,
    ) -> jax.Array:
        """``query`` through the single-kernel gather+MLP path
        (ops/fused_field.py): the pixel-aligned gather runs inside the
        conditioned MLP's Pallas kernel, software-pipelined against the
        GEMMs. Same math as ``query`` (reference models.py:146-266).

        Requires: a :func:`pack_encoding`'d single-scene single-view
        encoding (``SB*NS == 1``), spatial encoder only, bilinear/border
        indexing, and an unbaked ResnetFC in bf16 — the conditions under
        which the kernel is exact vs the XLA path. Inference only.
        """
        assert enc.latent_packed is not None, "pack_encoding() the encoding first"
        assert enc.latent_packed.shape[0] == 1 and enc.num_views == 1, (
            "fused gather path is single-scene single-view"
        )
        assert self.use_encoder and self.global_encoder is None
        assert self.encoder.index_interp == "bilinear"
        assert self.encoder.index_padding == "border"
        assert enc.tz_coarse is None, "fused path incompatible with baked tz"
        from ..models.encoder import latent_scaling
        from ..ops.gather_pallas import bilinear_pair_bases
        from ..ops.grid_sample import _compute_source_index

        SB, B, _ = xyz.shape
        z_feature, uv = self._point_inputs(enc, xyz, viewdirs)
        Hl, Wl = enc.latent.shape[1:3]
        uvn = uv * (latent_scaling(Hl, Wl) / enc.image_shape) - 1.0
        px = _compute_source_index(uvn[..., 0], Wl, "border", True)
        py = _compute_source_index(uvn[..., 1], Hl, "border", True)
        base, wg = bilinear_pair_bases(px, py, Hl, Wl)

        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) else self.mlp_fine
        out = mlp(
            (None, z_feature),
            combine_inner_dims=(1, B),
            fast=True,
            gather=(enc.latent_packed[0], base[0], wg[0]),
        )
        out = out.reshape(SB, B, 4)
        rgb = nn.sigmoid(out[..., :3])
        sigma = nn.relu(out[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1)


def pack_encoding(net: PixelNeRFNet, enc: SceneEncoding) -> SceneEncoding:
    """Precompute the LR-packed int32 feature table consumed by the fused
    gather+MLP kernel (:meth:`PixelNeRFNet.query_fused`). Cheap (one
    elementwise pass over the latent map per encode); rounds the latent to
    bf16 exactly like the default bf16 gather path."""
    from ..ops.gather_pallas import pack_lr_table

    assert net.use_encoder and enc.latent is not None
    packed = jax.vmap(pack_lr_table)(enc.latent)
    return enc.replace(latent_packed=packed)


def bake_encoding(
    net: PixelNeRFNet, variables, enc: SceneEncoding
) -> SceneEncoding:
    """Fold the MLPs' latent-injection GEMMs into the feature map (inference).

    The pixel-aligned latent enters ResnetFC *only* through the ``lin_z``
    linear layers (reference src/model/resnetfc.py:174-180), and bilinear
    interpolation commutes with linear maps, so
    ``lerp(corners) @ Wz + bz == lerp(corners @ Wz + bz)`` exactly (the lerp
    weights sum to 1, so the bias bakes in too — valid for 'border' padding,
    where every fetched row is a real map row). Baking therefore:

    - removes the d_latent x (n_lin_z*d_hidden) GEMM (~23% of the field
      MLP's FLOPs at the reference's 512x5 config) from the per-sample hot
      loop, paying it once per encode over Hl*Wl pixels instead; and
    - leaves the gather index count unchanged (the TPU gather is
      index-count-bound, so the wider rows are ~free).

    Returns a new :class:`SceneEncoding` with ``tz_coarse``/``tz_fine`` set;
    ``query`` uses them automatically. Exact in f32; under bf16 storage the
    rounding differs from the unbaked path by ~1 ulp.
    """
    assert net.use_encoder and net.global_encoder is None, (
        "baking requires the spatial encoder as the only latent source"
    )
    assert net.encoder.index_padding == "border", (
        "zeros-padding would zero the baked bias for out-of-bounds points"
    )
    lat = enc.latent
    n, hl, wl, c = lat.shape
    flat = lat.reshape(-1, c).astype(jnp.float32)

    def bake_one(mlp, params):
        # guard on the attributes actually used below: ImplicitNet defines
        # combine_layer but not n_blocks/lin_z; SPADE consumes z differently
        if not hasattr(mlp, "n_blocks") or getattr(mlp, "use_spade", False):
            return None
        n_lin_z = min(mlp.combine_layer, mlp.n_blocks)
        if mlp.d_latent <= 0 or n_lin_z <= 0:
            return None
        K = jnp.concatenate(
            [params[f"lin_z_{i}"]["kernel"] for i in range(n_lin_z)], axis=1
        )
        b = jnp.concatenate([params[f"lin_z_{i}"]["bias"] for i in range(n_lin_z)])
        tz = flat @ K + b
        return tz.reshape(n, hl, wl, -1).astype(lat.dtype)

    params = variables["params"]
    tz_coarse = bake_one(net.mlp_coarse, params["mlp_coarse"])
    tz_fine = (
        bake_one(net.mlp_fine, params["mlp_fine"])
        if net.mlp_fine is not None
        else None
    )
    # all-or-nothing: query_mlp derives z_pretransformed from tz_coarse
    # alone, so a half-baked pair would feed one MLP raw latents as tz
    if net.mlp_fine is not None and (tz_coarse is None or tz_fine is None):
        tz_coarse = tz_fine = None
    return enc.replace(tz_coarse=tz_coarse, tz_fine=tz_fine)
