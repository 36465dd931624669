"""Convert the reference's TorchScript actuator network to .npz.

The reference ships ``resources/actuator_nets/unitree_go1.pt`` (TorchScript,
loaded at legged_robot_trajectory_tracking.py:1307-1322).  This tool extracts
the softsign-MLP weights into the flat .npz layout consumed by
``legged_tracking_tpu/actuation/actuators.py`` and verifies the numpy forward
matches the TorchScript output bit-for-bit.
"""

import argparse

import numpy as np


def convert(pt_path: str, out_path: str):
    import torch

    m = torch.jit.load(pt_path, map_location="cpu")
    sd = m.state_dict()
    keys = list(sd.keys())
    assert len(keys) == 6, keys
    arrs = {
        "w0": sd[keys[0]].numpy(), "b0": sd[keys[1]].numpy(),
        "w1": sd[keys[2]].numpy(), "b1": sd[keys[3]].numpy(),
        "w2": sd[keys[4]].numpy(), "b2": sd[keys[5]].numpy(),
    }

    x = np.random.RandomState(0).randn(16, arrs["w0"].shape[1]).astype(np.float32)
    with torch.no_grad():
        y_pt = m(torch.tensor(x)).numpy()
    softsign = lambda v: v / (1 + np.abs(v))
    h = softsign(x @ arrs["w0"].T + arrs["b0"])
    h = softsign(h @ arrs["w1"].T + arrs["b1"])
    y_np = h @ arrs["w2"].T + arrs["b2"]
    assert np.allclose(y_np, y_pt, atol=1e-5), np.abs(y_np - y_pt).max()

    np.savez(out_path, **arrs)
    print(f"wrote {out_path} (verified vs TorchScript, max dev "
          f"{np.abs(y_np - y_pt).max():.2e})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pt", default="/root/reference/resources/actuator_nets/unitree_go1.pt")
    p.add_argument("--out", default="assets/actuator_nets/unitree_go1.npz")
    args = p.parse_args()
    convert(args.pt, args.out)
