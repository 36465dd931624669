"""Pure-numpy policy runtime for on-robot inference.

The reference deploys TorchScript modules (adaptation_module_latest.jit +
body_latest.jit, ppo_cse/__init__.py:286-298) on the Jetson.  Here the policy
is exported as a flat ``.npz`` (io/checkpoint.export_policy_npz) and executed
with numpy — no jax/torch needed on the robot.

Supports the CSE MLP family: adaptation MLP + actor body MLP with ELU
activations (AC_Args defaults).
"""

from __future__ import annotations

import numpy as np


def _elu(x):
    return np.where(x > 0, x, np.expm1(x))


class MLPParams:
    def __init__(self, layers):
        self.layers = layers  # [(W (out,in) or (in,out), b)]

    def __call__(self, x, act=_elu):
        for i, (w, b) in enumerate(self.layers):
            x = x @ w + b
            if i < len(self.layers) - 1:
                x = act(x)
        return x


def _collect_mlp(flat: dict, prefix: str) -> MLPParams:
    """Gather flax Dense params 'prefix/Dense_i/{kernel,bias}' in order."""
    layers = []
    i = 0
    while f"{prefix}/Dense_{i}/kernel" in flat:
        layers.append((flat[f"{prefix}/Dense_{i}/kernel"],
                       flat[f"{prefix}/Dense_{i}/bias"]))
        i += 1
    if not layers:
        raise KeyError(f"no Dense layers under {prefix}; keys: {list(flat)[:8]}")
    return MLPParams(layers)


class PolicyRuntime:
    """act_student equivalent: actions = actor(obs_history ⊕ adaptation(obs_history))."""

    def __init__(self, npz_path: str):
        flat = dict(np.load(npz_path))
        root = "params"
        self.adaptation = _collect_mlp(flat, f"{root}/adaptation_module")
        self.actor = _collect_mlp(flat, f"{root}/actor_body")

    def __call__(self, obs_history: np.ndarray) -> np.ndarray:
        latent = self.adaptation(obs_history)
        return self.actor(np.concatenate([obs_history, latent], axis=-1))
