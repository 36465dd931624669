"""CNN/GRU actor-critic over height-scan observations (ppo_cse_cnn variant).

Flax port of ``go1_gym_learn/ppo_cse_cnn/actor_critic.py``: a
``HeightMapEncoder`` (2-ch conv 16->32 + maxpool + linear, or MLP; :27-62)
embeds the (2, nx, ny) height block of EACH history frame; an optional
single-layer GRU runs over the (scalars ⊕ embedding) frame sequence
(``recurrent_latent_embedding``, :100-105); the policy consumes the last
frame's scalars ⊕ last recurrent latent (``process_obs_history``, :179-198).
Adaptation/actor/critic wiring then matches the CSE variant.

Improvement over the reference: the post-conv flatten size is derived from the
actual height-map shape (the reference hard-codes 3360 for (2,61,31) and
breaks for other scans).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .actor_critic import _ACT, MLP, clamp_std


@dataclass
class ACCnnArgs:
    init_noise_std: float = 1.0
    max_noise_std: float | None = None   # see ACArgs.max_noise_std
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    adaptation_module_branch_hidden_dims: Sequence[int] = (256, 128)
    use_decoder: bool = False
    use_cnn: bool = False
    use_gru: bool = False
    height_map_shape: Tuple[int, int, int] = (2, 21, 11)
    cnn_num_embedding: int = 256
    gru_num_embedding: int = 256
    normalize_obs: bool = False
    # stop the value gradient at the shared height-map encoder: the critic
    # head still trains, but cannot drag the policy through the encoder it
    # shares with the actor (resume-shock mitigation, TRAINING_NOTES.md;
    # off by default = reference semantics)
    critic_detach_encoder: bool = False


class HeightMapEncoder(nn.Module):
    height_map_shape: Tuple[int, int, int]
    num_embedding: int = 128
    use_cnn: bool = False
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        # x: (..., prod(height_map_shape))
        lead = x.shape[:-1]
        if self.use_cnn:
            c, h, w = self.height_map_shape
            x = x.reshape((-1, h, w, c))  # NHWC for flax
            x = nn.relu(nn.Conv(16, (3, 3), padding="SAME")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(nn.Conv(32, (3, 3), padding="SAME")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape((x.shape[0], -1))
            x = nn.Dense(self.num_embedding)(x)
        else:
            act = _ACT[self.activation]
            x = x.reshape((-1, int(np.prod(self.height_map_shape))))
            x = act(nn.Dense(256)(x))
            x = act(nn.Dense(self.num_embedding)(x))
        return x.reshape(lead + (self.num_embedding,))


class ActorCriticCNN(nn.Module):
    num_obs: int
    num_privileged_obs: int
    num_obs_history: int      # H * num_obs (flat)
    num_actions: int
    args: ACCnnArgs = field(default_factory=ACCnnArgs)

    def setup(self):
        a = self.args
        self.hm_size = int(np.prod(a.height_map_shape))
        self.scalar_size = self.num_obs - self.hm_size
        self.gru_input_dim = self.scalar_size + a.cnn_num_embedding
        self.gru_dim = a.gru_num_embedding if a.use_gru else self.gru_input_dim
        self.policy_input_dim = self.scalar_size + self.gru_dim

        self.height_map_encoder = HeightMapEncoder(
            tuple(a.height_map_shape), a.cnn_num_embedding, a.use_cnn, a.activation)
        if a.use_gru:
            self.gru = nn.GRUCell(features=a.gru_num_embedding)
        self.adaptation_module = MLP(tuple(a.adaptation_module_branch_hidden_dims),
                                     self.num_privileged_obs, a.activation)
        self.actor_body = MLP(tuple(a.actor_hidden_dims), self.num_actions, a.activation)
        self.critic_body = MLP(tuple(a.critic_hidden_dims), 1, a.activation)
        self.std = self.param("std", lambda k: jnp.full((self.num_actions,),
                                                        a.init_noise_std))

    def process_obs_history(self, obs_history):
        """(B, H*num_obs) -> (B, policy_input_dim) (reference :179-198)."""
        B = obs_history.shape[0]
        frames = obs_history.reshape(B, -1, self.num_obs)
        scalars = frames[:, :, : self.scalar_size]
        hm = frames[:, :, self.scalar_size:]
        emb = self.height_map_encoder(hm)              # (B, H, E)
        seq = jnp.concatenate([scalars, emb], axis=-1)  # (B, H, D)
        if self.args.use_gru:
            carry = jnp.zeros((B, self.args.gru_num_embedding))
            for t in range(seq.shape[1]):              # H is small (<=30), unrolled
                carry, _ = self.gru(carry, seq[:, t, :])
            latent = carry
        else:
            latent = seq[:, -1, :]
        return jnp.concatenate([scalars[:, -1, :], latent], axis=-1)

    def adapt(self, obs_history):
        return self.adaptation_module(self.process_obs_history(obs_history))

    def adaptation_target(self, privileged_obs):
        return privileged_obs

    def action_dist(self, obs, privileged_obs, obs_history):
        pin = self.process_obs_history(obs_history)
        latent = self.adaptation_module(pin)
        mean = self.actor_body(jnp.concatenate([pin, latent], axis=-1))
        return mean, clamp_std(self.std, self.args)

    def act_student(self, obs, obs_history):
        pin = self.process_obs_history(obs_history)
        latent = self.adaptation_module(pin)
        return self.actor_body(jnp.concatenate([pin, latent], axis=-1))

    def act_teacher(self, obs, privileged_obs, obs_history):
        pin = self.process_obs_history(obs_history)
        return self.actor_body(jnp.concatenate([pin, privileged_obs], axis=-1))

    def evaluate(self, obs, privileged_obs, obs_history):
        pin = self.process_obs_history(obs_history)
        if self.args.critic_detach_encoder:
            pin = jax.lax.stop_gradient(pin)
        v = self.critic_body(jnp.concatenate([pin, privileged_obs], axis=-1))
        return v[..., 0]

    def __call__(self, obs, privileged_obs, obs_history):
        mean, std = self.action_dist(obs, privileged_obs, obs_history)
        value = self.evaluate(obs, privileged_obs, obs_history)
        pred = self.adapt(obs_history)
        return mean, std, value, pred
