"""Checkpointing: orbax-backed save/restore of the full training state.

TPU-native analogue of the reference checkpoints (ac_weights.pt state_dict +
TorchScript exports + pickled curriculum, ppo_cse/__init__.py:274-298):
(params, optimizer states, learning rate, env curriculum scalars, RNG keys)
saved as one orbax tree; a light pickle path remains in learn/runner.py for
portability.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def save_checkpoint(path: str, train_state, env_state_scalars: dict | None = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = {"train_state": train_state._asdict()}
    if env_state_scalars:
        tree["env"] = env_state_scalars
    ckptr.save(path, tree, force=True)
    return path


def restore_checkpoint(path: str, train_state_template):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    restored = train_state_template._replace(**tree["train_state"])
    return restored, tree.get("env", {})


def export_policy_npz(path: str, params, meta: dict | None = None):
    """Flat .npz export of policy params for the deployment runtime (the
    TorchScript-free analogue of adaptation_module_latest.jit/body_latest.jit,
    reference ppo_cse/__init__.py:286-298)."""
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
