"""Model zoo: robot models and policy families.

- Robot: ``Go1Model`` / ``make_go1_model`` — the batched rigid-body model
  (masses, inertias, joint frames, collision spheres) parsed offline from the
  vendor URDF into ``physics/go1_model_data.py``.  The reference's
  mini_cheetah variant is dead code upstream (module absent; see PARITY.md).
- Policies: the three actor-critic families of the reference's learning
  stacks — CSE MLP (ppo_cse), CNN/GRU height-map encoder (ppo_cse_cnn), and
  the RMA teacher-student (ppo) — all exposing the unified protocol
  ``action_dist / evaluate / adapt / adaptation_target / act_student /
  act_teacher`` consumed by ``learn.PPO``.
"""

from ..learn.actor_critic import ACArgs, ActorCriticCSE
from ..learn.actor_critic_cnn import ACCnnArgs, ActorCriticCNN, HeightMapEncoder
from ..learn.actor_critic_rma import ACRmaArgs, ActorCriticRMA
from ..physics.model import Go1Model, make_go1_model

__all__ = [
    "Go1Model",
    "make_go1_model",
    "ACArgs",
    "ActorCriticCSE",
    "ACCnnArgs",
    "ActorCriticCNN",
    "HeightMapEncoder",
    "ACRmaArgs",
    "ActorCriticRMA",
]
