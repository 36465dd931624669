"""The minimal env contract the learn layer depends on.

Parity with ``go1_gym_learn/env/vec_env.py:10-39``: the abstract interface
between environments and PPO runners.  In this framework the contract is
functional — implementations expose a pure ``step_fn`` and ``observe`` over an
:class:`~legged_tracking_tpu.envs.state.EnvState` pytree in addition to the
stateful gym-ish methods.
"""

from __future__ import annotations

import abc


class VecEnv(abc.ABC):
    """Attributes every env must provide (used by PPO/Runner):

    - ``num_envs``, ``num_obs``, ``num_privileged_obs``, ``num_obs_history``,
      ``num_actions``, ``cfg``, ``metric_names``
    - ``reset_fn(key, randomize_ep_len) -> EnvState``
    - ``step_fn(state, actions) -> (EnvState, StepOut)`` (pure, jittable)
    - ``observe(state) -> {obs, privileged_obs, obs_history}``
    - stateful: ``reset()``, ``step(actions) -> (obs_dict, rew, done, info)``
    """

    @abc.abstractmethod
    def step_fn(self, state, actions):
        ...

    @abc.abstractmethod
    def observe(self, state):
        ...

    @abc.abstractmethod
    def reset_fn(self, key, randomize_ep_len: bool = False):
        ...
