from .actor_critic import ACArgs, ActorCriticCSE  # noqa: F401
from .actor_critic_cnn import ACCnnArgs, ActorCriticCNN, HeightMapEncoder  # noqa: F401
from .actor_critic_rma import ACRmaArgs, ActorCriticRMA  # noqa: F401
from .ppo import PPO, PPOArgs, TrainState  # noqa: F401
from .runner import Runner, RunnerArgs  # noqa: F401
