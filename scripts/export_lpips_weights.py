"""Convert torchvision AlexNet + lpips linear-head weights to the npz that
splatam_tpu.eval.lpips_jax loads.

Run on any machine that has torchvision and the `lpips` package (with
network access to download the pretrained weights), then copy the npz to
~/.cache/splatam_tpu/lpips_alex.npz on the TPU host:

    python scripts/export_lpips_weights.py --out lpips_alex.npz
"""
import argparse
import os


def main(out_path: str):
    import numpy as np
    import torch
    import torchvision

    alex = torchvision.models.alexnet(weights="IMAGENET1K_V1")
    state = {}
    for key in ["0", "3", "6", "8", "10"]:
        mod = alex.features[int(key)]
        state[f"features.{key}.weight"] = mod.weight.detach().numpy()
        state[f"features.{key}.bias"] = mod.bias.detach().numpy()

    import lpips

    net = lpips.LPIPS(net="alex")
    for i, lin in enumerate(net.lins):
        state[f"lin{i}.model.1.weight"] = lin.model[1].weight.detach().numpy()

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **state)
    print(f"wrote {out_path} ({len(state)} arrays)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out",
        default=os.path.expanduser("~/.cache/splatam_tpu/lpips_alex.npz"),
    )
    args = parser.parse_args()
    main(args.out)
