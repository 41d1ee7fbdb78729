"""Bidirectional converter: reference PyTorch checkpoints <-> flax variables.

The reference persists a flat ``state_dict`` (``pixel_nerf_latest``;
models.py:268-316) whose keys follow torch module paths
(``encoder.model.layer1.0.conv1.weight`` / ``mlp_coarse.blocks.2.fc_0.bias``
...). This module maps those to/from our flax variable tree so pretrained
reference checkpoints load directly, and our training runs can be exported
back for the reference's eval stack.

Layout transforms:
- conv weight (O, I, kh, kw)        <-> flax kernel (kh, kw, I, O)
- linear weight (O, I)              <-> flax kernel (I, O)
- batchnorm weight/bias             <-> scale/bias in 'params'
- batchnorm running_mean/var        <-> mean/var in 'batch_stats'
- num_batches_tracked               -> dropped
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


_RESNET_DOWNSAMPLE = re.compile(r"^downsample\.([01])$")
_RESNET_BLOCK = re.compile(r"^(layer\d+)\.(\d+)$")
_FC_BLOCK = re.compile(r"^blocks\.(\d+)$")
_LIN_Z = re.compile(r"^(lin_z|scale_z)\.(\d+)$")


def _translate_module_path(parts) -> Tuple[str, ...]:
    """torch dotted module path -> flax scope path (our naming)."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = _RESNET_BLOCK.match(".".join(parts[i : i + 2]))
        if m:
            out.extend([m.group(1), f"block{m.group(2)}"])
            i += 2
            continue
        m = _RESNET_DOWNSAMPLE.match(".".join(parts[i : i + 2]))
        if m:
            out.append("downsample_conv" if m.group(1) == "0" else "downsample_bn")
            i += 2
            continue
        m = _FC_BLOCK.match(".".join(parts[i : i + 2]))
        if m:
            out.append(f"block{m.group(1)}")
            i += 2
            continue
        m = _LIN_Z.match(".".join(parts[i : i + 2]))
        if m:
            out.append(f"{m.group(1)}_{m.group(2)}")
            i += 2
            continue
        out.append(p)
        i += 1
    return tuple(out)


def import_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Flat torch state_dict -> {'params': ..., 'batch_stats': ...} trees.

    Accepts torch tensors or numpy arrays. Unknown/non-persistent buffers
    (poses, image_shape, focal, c, latent*) are skipped, mirroring the
    reference's persistent=False buffers (models.py:76-84).
    """
    params: Dict = {}
    batch_stats: Dict = {}
    skip_suffixes = ("num_batches_tracked",)
    # _freqs/_phases: the reference PositionalEncoding's persistent buffers
    # (code.py:24-28) — pure functions of (num_freqs, freq_factor), recomputed
    # on our side, but present in real pixel_nerf_latest checkpoints.
    skip_names = {
        "poses", "image_shape", "focal", "c", "latent", "latent_scaling",
        "_freqs", "_phases",
    }

    for key, value in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf in skip_names or any(key.endswith(s) for s in skip_suffixes):
            continue
        value = np.asarray(getattr(value, "numpy", lambda: value)())
        mod_path = _translate_module_path(parts[:-1])

        if leaf == "running_mean":
            _set(batch_stats, mod_path + ("mean",), value)
        elif leaf == "running_var":
            _set(batch_stats, mod_path + ("var",), value)
        elif leaf == "weight":
            if value.ndim == 4:    # conv
                _set(params, mod_path + ("kernel",), value.transpose(2, 3, 1, 0))
            elif value.ndim == 2:  # linear
                _set(params, mod_path + ("kernel",), value.T)
            else:                  # batchnorm scale
                _set(params, mod_path + ("scale",), value)
        elif leaf == "bias":
            _set(params, mod_path + ("bias",), value)
        else:
            raise ValueError(f"Unrecognized state_dict key: {key}")
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _flatten(tree: Dict, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = np.asarray(v)
    return flat


def _untranslate_module_path(path) -> str:
    """flax scope path -> torch dotted module path."""
    out = []
    for p in path:
        if re.match(r"^block\d+$", p) and out and re.match(r"^layer\d+$", out[-1]):
            out.append(p[len("block") :])
        elif re.match(r"^block\d+$", p):
            out.extend(["blocks", p[len("block") :]])
        elif p == "downsample_conv":
            out.extend(["downsample", "0"])
        elif p == "downsample_bn":
            out.extend(["downsample", "1"])
        elif re.match(r"^(lin_z|scale_z)_\d+$", p):
            base, idx = p.rsplit("_", 1)
            out.extend([base, idx])
        else:
            out.append(p)
    return ".".join(out)


def export_state_dict(variables: Dict[str, Dict]) -> Dict[str, np.ndarray]:
    """flax variables -> flat torch-style state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    for path, value in _flatten(variables.get("params", {})).items():
        mod, leaf = path[:-1], path[-1]
        name = _untranslate_module_path(mod)
        if leaf == "kernel":
            if value.ndim == 4:
                out[f"{name}.weight"] = value.transpose(3, 2, 0, 1)
            else:
                out[f"{name}.weight"] = value.T
        elif leaf == "scale":
            out[f"{name}.weight"] = value
        elif leaf == "bias":
            out[f"{name}.bias"] = value
        else:
            raise ValueError(f"Unrecognized param leaf: {path}")
    for path, value in _flatten(variables.get("batch_stats", {})).items():
        mod, leaf = path[:-1], path[-1]
        name = _untranslate_module_path(mod)
        stat = "running_mean" if leaf == "mean" else "running_var"
        out[f"{name}.{stat}"] = value
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Dict]:
    """Load a reference ``pixel_nerf_latest`` file into flax variables."""
    import torch

    state = torch.load(path, map_location="cpu")
    return import_state_dict({k: v.numpy() for k, v in state.items()})


def import_torchvision_resnet(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert a raw torchvision resnet state_dict (ImageNet weights) into
    variables for ``ResNetFeatures``/``ResNetTrunk`` (scope 'model')."""
    filtered = {
        f"model.{k}": v
        for k, v in state_dict.items()
        if not k.startswith("fc.")
    }
    return import_state_dict(filtered)


def load_pretrained_encoder(variables: Dict[str, Dict], path: str) -> Dict[str, Dict]:
    """Initialize the spatial-encoder trunk from a torchvision ImageNet
    state_dict file (the reference trains from
    ``torchvision.models.resnet34(pretrained=True)``; src/model/encoder.py:62-64).

    Only the weights the model actually has are grafted (a ``num_layers<5``
    encoder ignores the deeper stages); shape mismatches (e.g. resnet18
    weights into a resnet34 encoder) raise with the offending path.
    Returns a new variables tree; params/batch_stats of other modules are
    shared, untouched.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    imported = import_torchvision_resnet(
        {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in sd.items()}
    )

    def graft(target: Dict, src: Dict, trail: Tuple[str, ...]) -> Dict:
        out = {}
        for k, v in target.items():
            here = trail + (k,)
            if isinstance(v, dict):
                if k not in src:
                    raise ValueError(
                        f"pretrained encoder missing module {'.'.join(here)}"
                    )
                out[k] = graft(v, src[k], here)
            else:
                if k not in src:
                    raise ValueError(
                        f"pretrained encoder missing tensor {'.'.join(here)}"
                    )
                if tuple(src[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"pretrained encoder shape mismatch at {'.'.join(here)}: "
                        f"{src[k].shape} vs model {v.shape}"
                    )
                out[k] = np.asarray(src[k], dtype=np.asarray(v).dtype)
        return out

    new_vars = dict(variables)
    if "encoder" not in new_vars.get("params", {}):
        raise ValueError("model has no spatial encoder to initialize")
    for col in ("params", "batch_stats"):
        tree = dict(new_vars.get(col, {}))
        if col == "batch_stats" and "encoder" not in tree:
            # an encoder without BatchNorm (e.g. the GroupNorm ConvEncoder)
            # carries no running stats; grafting params alone is the whole
            # import for it — but such encoders also have a non-resnet
            # param structure, so graft() above will already have raised a
            # precise missing-module error. Reaching here means the encoder
            # genuinely has no stats collection: nothing to import.
            continue
        enc = dict(tree["encoder"])
        enc["model"] = graft(enc["model"], imported[col]["model"], (col, "model"))
        tree["encoder"] = enc
        new_vars[col] = tree
    return new_vars
