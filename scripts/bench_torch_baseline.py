"""Measure the reference-equivalent PyTorch hot path on this host's CPU.

Reproduces the structure of the reference's eval_depth inner loop
(NeRFRenderer.composite, models/common/render/nerf.py:210-313 +
BTSNet.forward, models/bts/model/models_bts.py:266-338): a ResNet-50
monodepth2-style encode once per frame, then chunked evaluation at
eval_batch_size=100000 points — per chunk: projection matmuls, two
F.grid_samples (features + colors), positional encoding, a 64-wide MLP,
then cumprod alpha-compositing over the full frame.

This sets the vs_baseline denominator in bench.py (the repo publishes no
throughput numbers; the A40/A100 reference hardware is not available here).
"""
import time

import numpy as np
import torch
import torch.nn.functional as F

H, W, K = 192, 640, 64
EVAL_BATCH = 100_000
D_LATENT = 64


class _Bottleneck(torch.nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.c1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.b1 = torch.nn.BatchNorm2d(width)
        self.c2 = torch.nn.Conv2d(width, width, 3, stride=stride, padding=1,
                                  bias=False)
        self.b2 = torch.nn.BatchNorm2d(width)
        self.c3 = torch.nn.Conv2d(width, cout, 1, bias=False)
        self.b3 = torch.nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = self.down(x) if self.down is not None else x
        y = F.relu(self.b1(self.c1(x)))
        y = F.relu(self.b2(self.c2(y)))
        y = self.b3(self.c3(y))
        return F.relu(y + idn)


def _stage(cin, width, blocks, stride):
    layers = [_Bottleneck(cin, width, stride)]
    layers += [_Bottleneck(width * 4, width) for _ in range(blocks - 1)]
    return torch.nn.Sequential(*layers)


class Mini2(torch.nn.Module):
    """ResNet-50 encoder + light U-Net decoder to a 64-ch latent."""

    def __init__(self):
        super().__init__()
        self.stem = torch.nn.Sequential(
            torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            torch.nn.BatchNorm2d(64), torch.nn.ReLU())
        self.pool = torch.nn.MaxPool2d(3, stride=2, padding=1)
        self.l1 = _stage(64, 64, 3, 1)
        self.l2 = _stage(256, 128, 4, 2)
        self.l3 = _stage(512, 256, 6, 2)
        self.l4 = _stage(1024, 512, 3, 2)
        chans = [64, 256, 512, 1024, 2048]
        dec = [32, 32, 64, 128, 256]
        ups, mix = [], []
        for i in range(4, -1, -1):
            cin = chans[-1] if i == 4 else dec[i + 1]
            ups.append(torch.nn.Conv2d(cin, dec[i], 3, padding=1))
            skip = chans[i - 1] if i > 0 else 0
            mix.append(torch.nn.Conv2d(dec[i] + skip, dec[i], 3, padding=1))
        self.ups = torch.nn.ModuleList(ups)
        self.mix = torch.nn.ModuleList(mix)
        self.out = torch.nn.Conv2d(dec[0], D_LATENT, 3, padding=1)

    def forward(self, x):
        f = [self.stem(x)]
        f.append(self.l1(self.pool(f[-1])))
        f.append(self.l2(f[-1]))
        f.append(self.l3(f[-1]))
        f.append(self.l4(f[-1]))
        x = f[-1]
        for j, i in enumerate(range(4, -1, -1)):
            x = F.elu(self.ups[j](x))
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                s = f[i - 1]
                x = torch.cat([x[..., :s.shape[-2], :s.shape[-1]], s], 1)
            x = F.elu(self.mix[j](x))
        return self.out(x)


def main():
    torch.set_grad_enabled(False)
    enc = Mini2().eval()
    img = torch.randn(1, 3, H, W)
    w2c = torch.eye(4)[None].repeat(2, 1, 1)
    w2c[1, 0, 3] = -0.54
    k_mat = torch.tensor([[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1.0]])

    lin_in = torch.nn.Linear(D_LATENT + 39, 64)
    lin_out = torch.nn.Linear(64, 1)

    freqs = 1.5 * 2.0 ** torch.arange(6)

    # Rays for every pixel + stratified z samples.
    xs = torch.linspace(-1, 1, W)
    ys = torch.linspace(-1, 1, H)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    dirs = torch.stack([gx / 0.6, gy / 1.8, torch.ones_like(gx)], -1)
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    rays_d = dirs.reshape(-1, 3)
    z = torch.linspace(3.0, 80.0, K)[None].repeat(rays_d.shape[0], 1)

    def run_frame():
        feat = enc(img)  # (1, 64, H, W)
        colors = img * 0.5 + 0.5
        pts = (rays_d[:, None, :] * z[..., None]).reshape(-1, 3)  # (B*K, 3)
        sigmas = []
        for chunk in torch.split(pts, EVAL_BATCH):
            ones = torch.ones_like(chunk[:, :1])
            p_h = torch.cat([chunk, ones], -1)  # (P, 4)
            acc_feats = None
            for view in range(2):
                cam = (w2c[view, :3] @ p_h.T)  # (3, P)
                proj = (k_mat @ cam)
                xy = proj[:2] / proj[2:].clamp_min(1e-3)
                grid = xy.T.view(1, 1, -1, 2)
                if view == 0:
                    f = F.grid_sample(feat, grid, mode="bilinear",
                                      padding_mode="border",
                                      align_corners=False)[0, :, 0].T
                    zz = proj[2:].T
                    code_in = torch.cat([xy.T, zz], -1)
                    emb = (code_in[:, None, :] * freqs[None, :, None])
                    code = torch.cat(
                        [code_in, torch.sin(emb).flatten(1),
                         torch.cos(emb).flatten(1)], -1)
                    acc_feats = torch.cat([f, code], -1)
                else:
                    F.grid_sample(colors[:, view - 1] if colors.ndim == 5
                                  else colors, grid, mode="bilinear",
                                  padding_mode="border",
                                  align_corners=False)
            h = torch.relu(lin_in(acc_feats))
            sigmas.append(F.softplus(lin_out(h)))
        sigma = torch.cat(sigmas).view(-1, K)
        deltas = torch.cat([z[:, 1:] - z[:, :-1],
                            1e10 * torch.ones_like(z[:, :1])], -1)
        alphas = 1 - torch.exp(-deltas * torch.relu(sigma))
        alphas[:, -1] = 1
        t_acc = torch.cumprod(
            torch.cat([torch.ones_like(alphas[:, :1]), 1 - alphas + 1e-10],
                      -1), -1)
        weights = alphas * t_acc[:, :-1]
        depth = (weights * z).sum(-1)
        return depth

    run_frame()  # warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_frame()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"torch CPU reference-equivalent: {t:.2f}s/frame, "
          f"{H * W / t:.0f} rays/s")


if __name__ == "__main__":
    main()
