#!/usr/bin/env python
"""Export LPIPS-alex weights to the npz format rtgslam_tpu.models.lpips reads.

Run on a machine with network access + the `lpips` pip package:

    pip install lpips torch
    python scripts/export_lpips_weights.py --out lpips_alex.npz

then set LPIPS_WEIGHTS=/path/to/lpips_alex.npz when running eval.
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="lpips_alex.npz")
    a = p.parse_args()

    import lpips as lpips_pkg

    net = lpips_pkg.LPIPS(net="alex")
    out = {}
    # collect the 5 conv layers from the alexnet slices
    feature_convs = []
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        for m in getattr(net.net, slice_name):
            if m.__class__.__name__ == "Conv2d":
                feature_convs.append(m)
    for i, conv in enumerate(feature_convs):
        out[f"conv{i}_w"] = conv.weight.detach().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        out[f"lin{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)
    np.savez(a.out, **out)
    print(f"wrote {a.out}: {sorted(out)}")


if __name__ == "__main__":
    main()
