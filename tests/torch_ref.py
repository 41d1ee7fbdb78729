"""Independent torch/numpy referees for parity tests.

These re-derive the reference pixelNeRF math (transform, projection,
grid-sample conditioning, residual MLP, ResNet trunk) directly from the
published equations / torch built-ins, parameterized by OUR flax params —
so a passing test means our wiring matches the semantics, not that two
copies of the same code agree.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.tensor(np.asarray(x), dtype=torch.float32)


# ---------------------------------------------------------------------------
# ResNet trunk referee (torchvision-style BasicBlock stack) driven by flax params
# ---------------------------------------------------------------------------

def _conv(p, x, stride, padding):
    # flax kernel (kh, kw, I, O) -> torch (O, I, kh, kw)
    w = _t(p["kernel"]).permute(3, 2, 0, 1)
    return F.conv2d(x, w, stride=stride, padding=padding)


def _bn(variables, path, x, train=False):
    params = variables["params"]
    stats = variables["batch_stats"]
    for k in path:
        params = params[k]
        stats = stats[k]
    if train:
        mean = x.mean(dim=(0, 2, 3))
        var = x.var(dim=(0, 2, 3), unbiased=False)
    else:
        mean, var = _t(stats["mean"]), _t(stats["var"])
    return F.batch_norm(
        x, mean, var, _t(params["scale"]), _t(params["bias"]), training=False,
        eps=1e-5,
    )


def _params_at(variables, path):
    p = variables["params"]
    for k in path:
        p = p[k]
    return p


def torch_resnet_features(variables, x_nhwc, num_layers, use_first_pool, train=False,
                          stage_sizes=(3, 4, 6, 3)):
    """Referee for ResNetFeatures: returns list of NCHW stage features."""
    x = _t(x_nhwc).permute(0, 3, 1, 2)
    root = ["model"]
    x = _conv(_params_at(variables, root + ["conv1"]), x, 2, 3)
    x = _bn(variables, root + ["bn1"], x, train)
    x = F.relu(x)
    latents = [x]

    def stage(x, name, features, blocks, stride):
        for j in range(blocks):
            s = stride if j == 0 else 1
            blk = root + [name, f"block{j}"]
            identity = x
            y = _conv(_params_at(variables, blk + ["conv1"]), x, s, 1)
            y = _bn(variables, blk + ["bn1"], y, train)
            y = F.relu(y)
            y = _conv(_params_at(variables, blk + ["conv2"]), y, 1, 1)
            y = _bn(variables, blk + ["bn2"], y, train)
            if s != 1 or x.shape[1] != features:
                identity = _conv(
                    _params_at(variables, blk + ["downsample_conv"]), x, s, 0
                )
                identity = _bn(variables, blk + ["downsample_bn"], identity, train)
            x = F.relu(y + identity)
        return x

    feats = (64, 128, 256, 512)
    if num_layers > 1:
        if use_first_pool:
            x = F.max_pool2d(x, 3, stride=2, padding=1)
        x = stage(x, "layer1", feats[0], stage_sizes[0], 1)
        latents.append(x)
    if num_layers > 2:
        x = stage(x, "layer2", feats[1], stage_sizes[1], 2)
        latents.append(x)
    if num_layers > 3:
        x = stage(x, "layer3", feats[2], stage_sizes[2], 2)
        latents.append(x)
    if num_layers > 4:
        x = stage(x, "layer4", feats[3], stage_sizes[3], 2)
        latents.append(x)
    return latents


def torch_spatial_encoder(variables, x_nhwc, num_layers, use_first_pool, train=False):
    """Referee for the full SpatialEncoder: multi-scale upsample+concat, NCHW out."""
    latents = torch_resnet_features(variables, x_nhwc, num_layers, use_first_pool, train)
    sz = latents[0].shape[-2:]
    latents = [
        F.interpolate(l, sz, mode="bilinear", align_corners=True) for l in latents
    ]
    return torch.cat(latents, dim=1)


# ---------------------------------------------------------------------------
# ResnetFC referee (numpy)
# ---------------------------------------------------------------------------

def _lin(p, x):
    y = np.asarray(x, np.float32) @ np.asarray(p["kernel"], np.float32)
    if "bias" in p:
        y = y + np.asarray(p["bias"], np.float32)
    return y


def _combine(t, inner_dims, agg):
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape(-1, *inner_dims, t.shape[-1])
    return t.mean(axis=1) if agg == "average" else t.max(axis=1)


def numpy_resnetfc(
    params, zx, combine_inner_dims=(1,), d_latent=0, d_in=0, n_blocks=5,
    combine_layer=1000, combine_type="average",
):
    """Referee for ResnetFC.forward on 2-D input (B, d_latent + d_in)."""
    relu = lambda v: np.maximum(v, 0.0)
    zx = np.asarray(zx, np.float32)
    z = zx[..., :d_latent] if d_latent > 0 else None
    x = zx[..., d_latent:]
    if d_in > 0:
        x = _lin(params["lin_in"], x)
    for blkid in range(n_blocks):
        if blkid == combine_layer:
            x = _combine(x.reshape(-1, x.shape[-1]), combine_inner_dims, combine_type)
            z = None
        if z is not None and blkid < combine_layer:
            x = x + _lin(params[f"lin_z_{blkid}"], z)
        blk = params[f"block{blkid}"]
        net = _lin(blk["fc_0"], relu(x))
        dx = _lin(blk["fc_1"], relu(net))
        x = x + dx  # sizes equal -> identity shortcut
    return _lin(params["lin_out"], relu(x))


# ---------------------------------------------------------------------------
# Full query referee: world points -> (rgb, sigma), given a SceneEncoding
# ---------------------------------------------------------------------------

def numpy_positional_encoding(x, num_freqs, freq_factor, include_input):
    freqs = freq_factor * 2.0 ** np.arange(num_freqs, dtype=np.float32)
    freqs2 = np.repeat(freqs, 2)
    phases = np.zeros(2 * num_freqs, dtype=np.float32)
    phases[1::2] = np.pi * 0.5
    emb = np.sin(x[..., None, :] * freqs2[:, None] + phases[:, None])
    emb = emb.reshape(*x.shape[:-1], -1)
    return np.concatenate([x, emb], -1) if include_input else emb


def referee_query(
    variables, enc, xyz, viewdirs, mlp_name, *,
    num_freqs=6, freq_factor=1.5, n_blocks=5, combine_layer=3,
):
    """Reference-math query (default_mv flags: use_xyz, normalize_z, use_code,
    viewdirs appended after the code). grid_sample golden via torch."""
    latent_map = _t(enc.latent).permute(0, 3, 1, 2)  # NCHW
    poses = np.asarray(enc.poses)
    SB, B, _ = xyz.shape
    NS = enc.num_views
    d_latent = latent_map.shape[1]

    xyz_rep = np.repeat(np.asarray(xyz, np.float32), NS, axis=0)
    rot = poses[:, :3, :3]
    xyz_rot = np.einsum("nij,nbj->nbi", rot, xyz_rep)
    xyz_cam = xyz_rot + poses[:, None, :3, 3]

    z_feature = numpy_positional_encoding(
        xyz_rot.reshape(-1, 3), num_freqs, freq_factor, True
    )
    vdirs = np.repeat(np.asarray(viewdirs, np.float32), NS, axis=0)
    vdirs = np.einsum("nij,nbj->nbi", rot, vdirs).reshape(-1, 3)
    z_feature = np.concatenate([z_feature, vdirs], axis=-1)

    uv = -xyz_cam[..., :2] / xyz_cam[..., 2:3]
    focal = np.repeat(np.asarray(enc.focal), NS, axis=0)
    cc = np.repeat(np.asarray(enc.c), NS, axis=0)
    uv = uv * focal[:, None] + cc[:, None]

    # latent-pixel -> [-1,1] grid scaling (align_corners convention)
    Hl, Wl = latent_map.shape[-2:]
    img_w, img_h = np.asarray(enc.image_shape)
    scale = np.array([Wl / (Wl - 1) * 2.0 / img_w, Hl / (Hl - 1) * 2.0 / img_h])
    grid = _t(uv * scale - 1.0).unsqueeze(2)  # (SB*NS, B, 1, 2)
    samples = F.grid_sample(
        latent_map, grid, align_corners=True, mode="bilinear", padding_mode="border"
    )[..., 0]                                  # (SB*NS, C, B)
    latent = samples.permute(0, 2, 1).reshape(-1, d_latent).numpy()

    mlp_input = np.concatenate([latent, z_feature], axis=-1)
    out = numpy_resnetfc(
        variables["params"][mlp_name], mlp_input,
        combine_inner_dims=(NS, B), d_latent=d_latent,
        d_in=z_feature.shape[-1], n_blocks=n_blocks, combine_layer=combine_layer,
    )
    out = out.reshape(SB, B, 4)
    rgb = 1.0 / (1.0 + np.exp(-out[..., :3]))
    sigma = np.maximum(out[..., 3:4], 0.0)
    return np.concatenate([rgb, sigma], axis=-1)
