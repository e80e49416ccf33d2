"""Convert LPIPS-VGG weights to the .npz our evaluator loads
(behindthescenes_tpu/evaluation/metrics.py LPIPSVGG).

Run on a machine WITH network access / the `lpips` package:
  python scripts/convert_lpips_weights.py -o lpips_vgg.npz
Then point BTS_LPIPS_WEIGHTS (or the evaluator arg) at the file.
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default="lpips_vgg.npz")
    args = parser.parse_args()

    try:
        import lpips
        import torch
    except ImportError as e:
        raise SystemExit(f"needs the lpips package + torch: {e}")

    model = lpips.LPIPS(net="vgg")
    out = {}

    # Collect the 13 VGG16 convs in order across the 5 slices.
    conv_idx = 0
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        block = getattr(model.net, slice_name)
        for layer in block:
            if isinstance(layer, torch.nn.Conv2d):
                out[f"conv{conv_idx}_w"] = np.transpose(
                    layer.weight.detach().numpy(), (2, 3, 1, 0))
                out[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
                conv_idx += 1
    assert conv_idx == 13, conv_idx

    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w.reshape(-1)

    out["shift"] = model.scaling_layer.shift.detach().numpy().reshape(-1)
    out["scale"] = model.scaling_layer.scale.detach().numpy().reshape(-1)

    np.savez(args.output, **out)
    print(f"wrote {args.output} ({conv_idx} convs, 5 linear heads)")


if __name__ == "__main__":
    main()
