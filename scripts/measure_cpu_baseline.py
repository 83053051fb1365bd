"""Measure the CPU reference throughput baseline (images/sec).

The reference (uibk-uncover/ws-unet) publishes no timing numbers
(BASELINE.md), so the baseline is measured here, once, on this machine:
a faithful torch re-creation of its eval loop — unet_2 architecture
(src/unet/model/unet.py:54-189: two 3x3 reflect convs + ReLU per step,
maxpool, ConvTranspose2d(2,2), skip concat, sigmoid head), per-image
batch-1 CPU inference exactly like src/unet/evaluate.py:31-52
(transform, forward, border crop, x255) followed by the numpy WS estimate
(evaluate.py:125-133).

Writes results to BASELINE_cpu.json at the repo root; bench.py reads it.
"""

import json
import pathlib
import time

import numpy as np
import torch
import torch.nn.functional as F


class TorchUNet2(torch.nn.Module):
    def __init__(self):
        super().__init__()
        kw = dict(kernel_size=3, padding=1, padding_mode="reflect")
        self.e11 = torch.nn.Conv2d(1, 64, **kw)
        self.e12 = torch.nn.Conv2d(64, 64, **kw)
        self.pool1 = torch.nn.MaxPool2d(2, 2)
        self.e21 = torch.nn.Conv2d(64, 128, **kw)
        self.e22 = torch.nn.Conv2d(128, 128, **kw)
        self.pool2 = torch.nn.MaxPool2d(2, 2)
        self.e31 = torch.nn.Conv2d(128, 256, **kw)
        self.e32 = torch.nn.Conv2d(256, 256, **kw)
        self.up3 = torch.nn.ConvTranspose2d(256, 128, 2, 2)
        self.d31 = torch.nn.Conv2d(256, 128, **kw)
        self.d32 = torch.nn.Conv2d(128, 128, **kw)
        self.up4 = torch.nn.ConvTranspose2d(128, 64, 2, 2)
        self.d41 = torch.nn.Conv2d(128, 64, **kw)
        self.d42 = torch.nn.Conv2d(64, 64, **kw)
        self.out = torch.nn.Conv2d(64, 1, 1)

    def forward(self, x):
        e1 = F.relu(self.e12(F.relu(self.e11(x))))
        e2 = F.relu(self.e22(F.relu(self.e21(self.pool1(e1)))))
        e3 = F.relu(self.e32(F.relu(self.e31(self.pool2(e2)))))
        d3 = F.relu(self.d32(F.relu(self.d31(
            torch.cat([self.up3(e3), e2], 1)))))
        d4 = F.relu(self.d42(F.relu(self.d41(
            torch.cat([self.up4(d3), e1], 1)))))
        return torch.sigmoid(self.out(d4))


def main():
    # use every available core: torch_threads == os.cpu_count(), so the
    # recorded figure is the best the reference can do on this host (on a
    # single-core bench host the "multi-thread" and single-thread numbers
    # coincide — recorded explicitly so the multiplier is not overstated)
    import os
    torch.set_num_threads(os.cpu_count())
    model = TorchUNet2().eval()
    n_params = sum(p.numel() for p in model.parameters())

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (8, 512, 512)).astype("uint8")

    def infer_single(x_u8):
        # parity with unet/evaluate.py:31-52 + 109-139 (per image, batch 1)
        x = x_u8.astype("float32")
        with torch.no_grad():
            x_ = torch.from_numpy(x / 255.0)[None, None]
            y_ = model(x_)
        x_hat = y_.numpy()[0, 0, 1:-1, 1:-1] * 255.0
        xi = x[1:-1, 1:-1]
        x_bar = (xi.astype("uint8") ^ 1).astype("float32")
        beta = np.mean((xi - x_bar) * (xi - x_hat))
        l1 = np.mean(np.abs(xi - x_hat))
        return beta, l1

    # warmup
    infer_single(images[0])
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 30 or n < 8:
        infer_single(images[n % len(images)])
        n += 1
    dt = time.perf_counter() - t0
    ips = n / dt

    out = {
        "metric": "images/sec CPU reference (torch unet_2 batch-1 + numpy WS)",
        "images_per_sec": ips,
        "images": n,
        "seconds": dt,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": __import__("os").cpu_count(),
        "n_params": n_params,
        "machine": "bench host (same machine as TPU bench)",
    }
    path = pathlib.Path(__file__).resolve().parent.parent / "BASELINE_cpu.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
