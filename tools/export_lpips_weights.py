"""Export LPIPS-alex weights to the npz format hierslam_tpu.eval.lpips reads.

Run on any machine WITH internet + the ``lpips`` pip package:

    python tools/export_lpips_weights.py /path/to/lpips_alex.npz

then drop the file at <repo>/weights/lpips_alex.npz (or point
$LPIPS_WEIGHTS / config['lpips_weights'] at it).
"""
import sys

import numpy as np


def main(out_path: str):
    import lpips  # pip install lpips
    import torch

    model = lpips.LPIPS(net="alex", spatial=False)
    alex = model.net  # lpips.pretrained_networks.alexnet
    convs = [m for m in alex.modules() if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, f"expected 5 convs, got {len(convs)}"
    out = {}
    for i, c in enumerate(convs, start=1):
        out[f"conv{i}_w"] = c.weight.detach().numpy()
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate(model.lins, start=1):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}_w"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(sorted(out)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
