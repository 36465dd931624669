"""Original RMA / walk-these-ways teacher-student actor-critic.

Flax port of ``go1_gym_learn/ppo/actor_critic.py``: an ``env_factor_encoder``
maps the privileged obs to a latent (:42-60), the ``adaptation_module`` maps
the obs history to the same latent space (:63-78), and actor/critic consume
``obs ⊕ latent`` (:82-104, update_distribution :145-149).  Training drives the
actor with the TEACHER latent (encoder of the true privileged obs); the
adaptation module regresses onto the (stop-gradient) teacher latent.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .actor_critic import MLP, clamp_std


@dataclass
class ACRmaArgs:
    """AC_Args parity (ppo/actor_critic.py:10-28)."""
    init_noise_std: float = 1.0
    max_noise_std: float | None = None   # see ACArgs.max_noise_std
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    env_factor_encoder_branch_hidden_dims: Sequence[int] = (256, 128)
    env_factor_encoder_latent_dim: int = 18
    adaptation_module_branch_hidden_dims: Sequence[int] = (256, 32)


class ActorCriticRMA(nn.Module):
    num_obs: int
    num_privileged_obs: int
    num_obs_history: int
    num_actions: int
    args: ACRmaArgs = field(default_factory=ACRmaArgs)

    def setup(self):
        a = self.args
        self.env_factor_encoder = MLP(tuple(a.env_factor_encoder_branch_hidden_dims),
                                      a.env_factor_encoder_latent_dim, a.activation)
        self.adaptation_module = MLP(tuple(a.adaptation_module_branch_hidden_dims),
                                     a.env_factor_encoder_latent_dim, a.activation)
        self.actor_body = MLP(tuple(a.actor_hidden_dims), self.num_actions, a.activation)
        self.critic_body = MLP(tuple(a.critic_hidden_dims), 1, a.activation)
        self.std = self.param("std", lambda k: jnp.full((self.num_actions,),
                                                        a.init_noise_std))

    def adapt(self, obs_history):
        return self.adaptation_module(obs_history)

    def adaptation_target(self, privileged_obs):
        return self.env_factor_encoder(privileged_obs)

    def action_dist(self, obs, privileged_obs, obs_history):
        """Teacher distribution (update_distribution, ppo/actor_critic.py:145-149)."""
        latent = self.env_factor_encoder(privileged_obs)
        mean = self.actor_body(jnp.concatenate([obs, latent], axis=-1))
        return mean, clamp_std(self.std, self.args)

    def act_student(self, obs, obs_history):
        latent = self.adaptation_module(obs_history)
        return self.actor_body(jnp.concatenate([obs, latent], axis=-1))

    def act_teacher(self, obs, privileged_obs, obs_history):
        latent = self.env_factor_encoder(privileged_obs)
        return self.actor_body(jnp.concatenate([obs, latent], axis=-1))

    def evaluate(self, obs, privileged_obs, obs_history):
        latent = self.env_factor_encoder(privileged_obs)
        v = self.critic_body(jnp.concatenate([obs, latent], axis=-1))
        return v[..., 0]

    def __call__(self, obs, privileged_obs, obs_history):
        mean, std = self.action_dist(obs, privileged_obs, obs_history)
        value = self.evaluate(obs, privileged_obs, obs_history)
        pred = self.adapt(obs_history)
        return mean, std, value, pred
