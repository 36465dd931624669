"""Actor-critic with concurrent state estimation (CSE).

Flax re-expression of the reference ``go1_gym_learn/ppo_cse/actor_critic.py``:

- ``adaptation_module``: MLP(obs_history) -> predicted privileged obs
  (actor_critic.py:43-55)
- ``actor_body``: MLP(obs_history ⊕ latent) -> action mean (:61-70, :121-124)
- ``critic_body``: MLP(obs_history ⊕ true privileged obs) -> value (:73-82, :154-156)
- learned state-independent ``std`` (init 1.0, :92)

The teacher path feeds the *true* privileged obs into the same actor body
(act_teacher, :150).  All dims/widths match AC_Args defaults
([512,256,128] actor/critic, [256,128] adaptation, ELU).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_ACT = {
    "elu": nn.elu, "relu": nn.relu, "selu": nn.selu, "crelu": nn.relu,
    "lrelu": nn.leaky_relu, "tanh": nn.tanh, "sigmoid": nn.sigmoid,
}


@dataclass
class ACArgs:
    """AC_Args parity (ppo_cse/actor_critic.py:10-20)."""
    init_noise_std: float = 1.0
    # Optional exploration-noise ceiling (deliberate divergence from the
    # reference, which has none): the entropy bonus inflates the learned
    # state-independent std while KL ∝ 1/σ² shrinks, so the adaptive-KL
    # controller keeps RAISING lr — a positive-feedback loop that collapsed
    # the published goal recipe at ~it5200 (std 1.0→9.7,
    # docs/TRAINING_NOTES.md). A ceiling saturates the entropy bonus and
    # breaks the loop; None preserves exact reference semantics.
    max_noise_std: float | None = None
    actor_hidden_dims: Sequence[int] = (512, 256, 128)
    critic_hidden_dims: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    adaptation_module_branch_hidden_dims: Sequence[int] = (256, 128)
    use_decoder: bool = False
    normalize_obs: bool = False


class MLP(nn.Module):
    hidden: Sequence[int]
    out: int
    activation: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for h in self.hidden:
            x = act(nn.Dense(h)(x))
        return nn.Dense(self.out)(x)


class ActorCriticCSE(nn.Module):
    num_obs: int
    num_privileged_obs: int
    num_obs_history: int
    num_actions: int
    args: ACArgs = field(default_factory=ACArgs)

    def setup(self):
        a = self.args
        self.adaptation_module = MLP(tuple(a.adaptation_module_branch_hidden_dims),
                                     self.num_privileged_obs, a.activation)
        self.actor_body = MLP(tuple(a.actor_hidden_dims), self.num_actions, a.activation)
        self.critic_body = MLP(tuple(a.critic_hidden_dims), 1, a.activation)
        self.std = self.param("std", lambda k: jnp.full((self.num_actions,),
                                                        a.init_noise_std))

    def __call__(self, obs, privileged_obs, obs_history):
        """Init-everything forward (used only for parameter shape inference)."""
        mean, std = self.action_dist(obs, privileged_obs, obs_history)
        value = self.evaluate(obs, privileged_obs, obs_history)
        pred = self.adapt(obs_history)
        return mean, std, value, pred

    def adapt(self, obs_history):
        return self.adaptation_module(obs_history)

    def adaptation_target(self, privileged_obs):
        """CSE supervises the privileged obs itself (ppo.py:164-185)."""
        return privileged_obs

    def action_dist(self, obs, privileged_obs, obs_history):
        """Student distribution (update_distribution, :121-124); obs and
        privileged_obs are unused (protocol shared with the RMA variant)."""
        latent = self.adaptation_module(obs_history)
        mean = self.actor_body(jnp.concatenate([obs_history, latent], axis=-1))
        return mean, clamp_std(self.std, self.args)

    def act_student(self, obs, obs_history):
        """Deterministic deployment policy (act_student, :144-148)."""
        latent = self.adaptation_module(obs_history)
        return self.actor_body(jnp.concatenate([obs_history, latent], axis=-1))

    def act_teacher(self, obs, privileged_obs, obs_history):
        return self.actor_body(jnp.concatenate([obs_history, privileged_obs], axis=-1))

    def evaluate(self, obs, privileged_obs, obs_history):
        v = self.critic_body(jnp.concatenate([obs_history, privileged_obs], axis=-1))
        return v[..., 0]


def clamp_std(std, args):
    """Floor (numerics) and optional ceiling (ACArgs.max_noise_std) for the
    learned state-independent exploration std. Beyond the ceiling the clip
    gradient is zero, so the entropy bonus stops inflating the parameter."""
    s = jnp.maximum(jnp.abs(std), 1e-3)
    if getattr(args, "max_noise_std", None) is not None:
        s = jnp.minimum(s, args.max_noise_std)
    return s


def normal_log_prob(mean, std, actions):
    var = std * std
    return jnp.sum(-0.5 * jnp.square(actions - mean) / var
                   - jnp.log(std) - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1)


def normal_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std), axis=-1)


def normal_kl(mu1, sigma1, mu2, sigma2):
    """KL(N1||N2)-style divergence used for the adaptive LR schedule
    (ppo_cse/ppo.py:112-117) — matches the reference formula exactly."""
    return jnp.sum(
        jnp.log(sigma2 / sigma1 + 1e-5)
        + (jnp.square(sigma1) + jnp.square(mu1 - mu2)) / (2.0 * jnp.square(sigma2))
        - 0.5, axis=-1)
