"""Instrumented mini-run of the trained-proxy recipe: every few steps report
eval-mode alpha (is relu(sigma) alive?), render rgb mean/std (or is the rgb
head painting a constant?), and raw sigma activations at scene points.

This probe found both r5 collapse mechanisms (see train_reference_proxy's
docstring): (1) whole sigma heads born dead under relu at bias 0 — the
renderer's noise_std is added AFTER the model's own relu (reference
nerf.py:225 vs models.py:263) and cannot revive them; (2) early-Adam weight
drift at lr 5e-4 pushing an alive head's pre-activation uniformly through
the dead zone within ~5 steps (w.h moves O(lr x d_hidden) per step). The
defaults below reproduce the HEALTHY regime; pass --lr 5e-4 --sigma_bias 1
to reproduce the fine-head death.
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))
import train_reference_proxy as trp  # noqa: E402


def main(steps=40, lr=1e-4, seed=3, sigma_bias=4.0, probe_every=5,
         rays_per_step=96, fg_frac=0.875):
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    ref_model, ref_nerf = trp.load_reference_modules()
    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.data.synthetic import SyntheticSphereDataset
    from pixelnerf_tpu.utils import geometry

    conf = load_config(os.path.join(trp.REF_ROOT, "conf/exp/srn.conf"))
    conf["model"]["encoder"]["pretrained"] = False
    torch.manual_seed(seed)
    net = ref_model.make_model(conf["model"]).train()
    with torch.no_grad():
        for mlp in (net.mlp_coarse, net.mlp_fine):
            if mlp is not None and hasattr(mlp, "lin_out"):
                mlp.lin_out.weight[3].zero_()
                mlp.lin_out.bias[3] = sigma_bias
    conf["renderer"]["n_coarse"] = 24
    conf["renderer"]["n_fine"] = 8
    conf["renderer"]["white_bkgd"] = False
    renderer = ref_nerf.NeRFRenderer.from_conf(
        conf["renderer"], white_bkgd=False, lindisp=False).train()
    render_par = renderer.bind_parallel(net, gpus=None)
    dset = SyntheticSphereDataset(num_objects=1, num_views=8,
                                  image_size=(64, 64), white_bkgd=True)
    z_near, z_far = dset.z_near, dset.z_far
    obj = dset[0]
    NV, H, W = obj["images"].shape[:3]
    optim = torch.optim.Adam(net.parameters(), lr=lr)
    rng = np.random.default_rng(seed)

    probe_rays = np.asarray(geometry.gen_rays(
        obj["poses"][None, 1], W, H, obj["focal"], z_near, z_far,
        c=obj["c"][None])).reshape(-1, 8)[::16].copy()

    def encode0():
        net.encode(
            torch.from_numpy(obj["images"][None, :1].transpose(0, 1, 4, 2, 3).copy()),
            torch.from_numpy(obj["poses"][None, :1]),
            torch.tensor(float(obj["focal"])),
            c=torch.from_numpy(np.asarray(obj["c"], np.float32)[None]))

    def probe(tag):
        net.eval(); renderer.eval()
        with torch.no_grad():
            encode0()
            out = render_par(torch.from_numpy(probe_rays[None]),
                             want_weights=True)
            for key in ("coarse", "fine"):
                if key not in out or not len(out[key]):
                    continue
                rgb = out[key]["rgb"].numpy().reshape(-1, 3)
                ws = out[key]["weights"].numpy().sum(-1).reshape(-1)
                print(f"[{tag}/{key}] rgb mean={rgb.mean():.3f} "
                      f"std={rgb.std():.4f} alpha mean={ws.mean():.3f} "
                      f"max={ws.max():.3f}", flush=True)
            # raw sigma pre-activation at scene-center points
            pts = torch.from_numpy(
                rng.uniform(-0.4, 0.4, (1, 64, 3)).astype(np.float32))
            vd = torch.zeros_like(pts); vd[..., 2] = -1.0
            for name, mlp_out in (("coarse", net(pts, coarse=True, viewdirs=vd)),
                                  ("fine", net(pts, coarse=False, viewdirs=vd))):
                # net returns post-activation (relu'd sigma at ch 3)
                sig = mlp_out[..., 3].numpy()
                print(f"    [{name}] relu(sigma) frac>0="
                      f"{(sig > 0).mean():.2f} mean={sig.mean():.3f} "
                      f"max={sig.max():.3f}", flush=True)
        net.train(); renderer.train()

    probe("init")
    for it in range(steps):
        src = rng.choice(NV, size=1, replace=False)
        tgt = int(rng.integers(NV))
        cam_rays = np.asarray(geometry.gen_rays(
            obj["poses"][None, tgt], W, H, obj["focal"], z_near, z_far,
            c=obj["c"][None])).reshape(-1, 8)
        fg = np.flatnonzero(
            np.abs(obj["images"][tgt] - 1.0).max(-1).reshape(-1) > 0.05)
        n_fg = min(int(fg_frac * rays_per_step), len(fg))
        pix = np.concatenate([
            rng.choice(fg, size=n_fg, replace=True),
            rng.integers(0, H * W, rays_per_step - n_fg)])
        net.encode(
            torch.from_numpy(obj["images"][None, src].transpose(0, 1, 4, 2, 3).copy()),
            torch.from_numpy(obj["poses"][None, src]),
            torch.tensor(float(obj["focal"])),
            c=torch.from_numpy(np.asarray(obj["c"], np.float32)[None]))
        rays = torch.from_numpy(cam_rays[pix][None].copy())
        rgb_gt = torch.from_numpy(
            (obj["images"][tgt].reshape(-1, 3)[pix][None] * 0.5 + 0.5
             ).astype(np.float32))
        out = render_par(rays)
        loss = torch.nn.functional.mse_loss(out["coarse"]["rgb"], rgb_gt)
        if "fine" in out and len(out["fine"]) > 0:
            loss = loss + torch.nn.functional.mse_loss(out["fine"]["rgb"], rgb_gt)
        optim.zero_grad(); loss.backward(); optim.step()
        if it % probe_every == 0 or it == steps - 1:
            print(f"step {it} loss={float(loss.detach()):.4f}", flush=True)
            probe(f"s{it}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--sigma_bias", type=float, default=4.0)
    a = ap.parse_args()
    main(steps=a.steps, lr=a.lr, seed=a.seed, sigma_bias=a.sigma_bias)
