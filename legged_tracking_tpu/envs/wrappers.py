"""Env wrappers.

``HistoryWrapper`` parity (go1_gym/envs/wrappers/history_wrapper.py:7-43):
in this framework the rolling observation history lives INSIDE the env state
(``EnvState.obs_history``) so the whole rollout stays fused under one jit —
the wrapper below is a thin adapter for code written against the reference's
wrapper API (it is a no-op over our dict-returning envs).
"""

from __future__ import annotations


class HistoryWrapper:
    """API-compatibility shim: our envs already emit
    {obs, privileged_obs, obs_history} dicts with the history maintained
    on-device; this class simply forwards."""

    def __init__(self, env):
        self.env = env
        self.obs_history_length = env.cfg.env.num_observation_history
        self.num_obs_history = env.num_obs_history

    def __getattr__(self, name):
        return getattr(self.env, name)

    def step(self, action):
        obs_dict, rew, done, info = self.env.step(action)
        return obs_dict, rew, done, info

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def get_observations(self):
        return self.env._observe_jit(self.env.state)
