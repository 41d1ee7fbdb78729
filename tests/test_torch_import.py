"""Checkpoint conversion: torch state_dict <-> flax variables."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from pixelnerf_tpu.config import load_config
from pixelnerf_tpu.models import make_model
from pixelnerf_tpu.models.torch_import import (
    export_state_dict,
    import_state_dict,
    import_torchvision_resnet,
)

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_net():
    conf = load_config(os.path.join(REPO, "conf", "exp", "sn64.conf"))
    conf["model"]["mlp_coarse"]["d_hidden"] = 32
    conf["model"]["mlp_fine"]["d_hidden"] = 32
    conf["model"]["encoder"]["num_layers"] = 2
    net = make_model(conf["model"])
    variables = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 16, 16, 3)), jnp.eye(4)[None, None], jnp.asarray(20.0),
        jnp.zeros((1, 4, 3)), jnp.ones((1, 4, 3)),
    )
    return net, variables


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_roundtrip_full_model():
    net, variables = _tiny_net()
    plain = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    sd = export_state_dict(plain)
    back = import_state_dict(sd)
    orig = dict(_tree_paths(plain["params"]))
    rec = dict(_tree_paths(back["params"]))
    assert set(orig) == set(rec)
    for k in orig:
        np.testing.assert_array_equal(orig[k], rec[k], err_msg=str(k))
    orig_bs = dict(_tree_paths(plain["batch_stats"]))
    rec_bs = dict(_tree_paths(back["batch_stats"]))
    assert set(orig_bs) == set(rec_bs)


def test_exported_keys_match_reference_naming():
    net, variables = _tiny_net()
    sd = export_state_dict(jax.device_get(variables))
    keys = set(sd)
    # spot-check the reference's exact key spellings
    assert "encoder.model.conv1.weight" in keys
    assert "encoder.model.bn1.running_mean" in keys
    assert "encoder.model.layer1.0.conv1.weight" in keys
    assert "mlp_coarse.lin_in.weight" in keys
    assert "mlp_coarse.blocks.0.fc_0.bias" in keys
    assert "mlp_coarse.lin_z.0.weight" in keys
    assert "mlp_fine.lin_out.bias" in keys
    # shapes follow torch conventions
    assert sd["encoder.model.conv1.weight"].shape == (64, 3, 7, 7)
    assert sd["mlp_coarse.lin_in.weight"].shape[0] == 32  # (out, in)


def test_import_linear_semantics():
    """A torch Linear imported into flax computes the same function."""
    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 3)
    sd = {f"lin_in.{k}": v.detach().numpy() for k, v in lin.state_dict().items()}
    variables = import_state_dict(sd)
    x = np.random.default_rng(0).normal(size=(5, 6)).astype(np.float32)
    ours = x @ variables["params"]["lin_in"]["kernel"] + variables["params"]["lin_in"]["bias"]
    theirs = lin(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_import_conv_semantics():
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    sd = {"conv1.weight": conv.weight.detach().numpy()}
    variables = import_state_dict(sd)
    import flax.linen as nn

    fconv = nn.Conv(8, (3, 3), strides=2, padding=((1, 1), (1, 1)), use_bias=False)
    x = np.random.default_rng(1).normal(size=(2, 10, 10, 3)).astype(np.float32)
    ours = fconv.apply(
        {"params": {"kernel": variables["params"]["conv1"]["kernel"]}},
        jnp.asarray(x),
    )
    theirs = conv(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs, atol=1e-4
    )


def test_torchvision_resnet_key_mapping():
    """Synthesize a torchvision-style resnet18 state_dict and import it."""
    sd = {
        "conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "bn1.weight": np.ones(64, np.float32),
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.zeros(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32),
        "bn1.num_batches_tracked": np.zeros((), np.int64),
        "layer1.0.conv1.weight": np.zeros((64, 64, 3, 3), np.float32),
        "layer2.0.downsample.0.weight": np.zeros((128, 64, 1, 1), np.float32),
        "layer2.0.downsample.1.weight": np.ones(128, np.float32),
        "layer2.0.downsample.1.running_var": np.ones(128, np.float32),
        "fc.weight": np.zeros((1000, 512), np.float32),
        "fc.bias": np.zeros(1000, np.float32),
    }
    v = import_torchvision_resnet(sd)
    p = v["params"]["model"]
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert p["layer1"]["block0"]["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert p["layer2"]["block0"]["downsample_conv"]["kernel"].shape == (1, 1, 64, 128)
    assert v["batch_stats"]["model"]["layer2"]["block0"]["downsample_bn"]["var"].shape == (128,)
    assert "fc" not in p  # classifier head dropped


def test_load_pretrained_encoder(tmp_path):
    """Torchvision ImageNet weights graft into the encoder trunk; the rest of
    the model is untouched (reference trains from pretrained resnet34)."""
    from pixelnerf_tpu.models.torch_import import load_pretrained_encoder
    from torchvision_stub import resnet34

    net, variables = _tiny_net()  # encoder num_layers=2: conv1/bn1/layer1 used
    torch.manual_seed(3)
    tv = resnet34()
    path = str(tmp_path / "resnet34.pth")
    torch.save(tv.state_dict(), path)

    new_vars = load_pretrained_encoder(variables, path)
    got = np.asarray(new_vars["params"]["encoder"]["model"]["conv1"]["kernel"])
    want = tv.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    got_bn = np.asarray(new_vars["batch_stats"]["encoder"]["model"]["bn1"]["mean"])
    np.testing.assert_array_equal(got_bn, tv.state_dict()["bn1.running_mean"].numpy())
    # non-encoder params are shared, not copied
    assert new_vars["params"]["mlp_coarse"] is variables["params"]["mlp_coarse"]


def test_load_pretrained_encoder_shape_mismatch(tmp_path):
    from pixelnerf_tpu.models.torch_import import load_pretrained_encoder
    from torchvision_stub import resnet34

    net, variables = _tiny_net()
    tv = resnet34()
    sd = tv.state_dict()
    sd["conv1.weight"] = torch.zeros(64, 3, 3, 3)  # wrong kernel size
    path = str(tmp_path / "bad.pth")
    torch.save(sd, path)
    with pytest.raises(ValueError, match="shape mismatch"):
        load_pretrained_encoder(variables, path)
