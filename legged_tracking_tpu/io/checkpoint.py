"""Checkpoint exports.

Training checkpoints (params, BOTH optimizer states, learning rate,
curriculum scalars, obs normalizer) are written by ``learn/runner.py`` as a
single numpy-pickle — the TPU-native analogue of the reference's
ac_weights.pt state_dict + pickled curriculum (ppo_cse/__init__.py:274-298).
This module holds the deployment-side export: a flat ``.npz`` of the policy
params consumed by the numpy runtime on the robot (the TorchScript-free
analogue of adaptation_module_latest.jit / body_latest.jit).
"""

from __future__ import annotations

import numpy as np


def export_policy_npz(path: str, params, meta: dict | None = None):
    """Flat .npz export of policy params for the deployment runtime
    (reference ppo_cse/__init__.py:286-298)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", params)
    if meta:
        for k, v in meta.items():
            flat[f"__meta__/{k}"] = np.asarray(v)
    np.savez(path, **flat)
    return path
