"""All three policy families drive the same PPO iteration (ppo / ppo_cse /
ppo_cse_cnn parity, go1_gym_learn SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legged_tracking_tpu.config import Cfg, config_go1
from legged_tracking_tpu.envs import LeggedEnv
from legged_tracking_tpu.learn import (ACCnnArgs, ACRmaArgs, ActorCriticCNN,
                                       ActorCriticRMA, PPO, PPOArgs)


def make_env(num_envs=4, history=3):
    cfg = config_go1(Cfg())
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "plane"
    cfg.env.command_type = "xy"
    cfg.terrain.measure_front_half = True
    cfg.control.control_type = "P"
    cfg.env.episode_length_s = 2.0
    cfg.env.num_observation_history = history
    cfg.control.decimation = 2  # halve physics compile cost
    return LeggedEnv(cfg)


def run_one_iteration(env, ac):
    alg = PPO(env, args=PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                                num_learning_epochs=1), ac=ac)
    ts = alg.init(jax.random.key(0))
    env_state = env.reset_fn(jax.random.key(1), False)
    obs = jax.jit(env.observe)(env_state)
    ts2, _, _, metrics = alg.train_iteration_jit(ts, env_state, obs, jax.random.key(2))
    assert bool(jnp.isfinite(metrics["value_loss"]))
    assert bool(jnp.isfinite(metrics["adaptation_loss"]))
    return alg, ts2


@pytest.mark.parametrize("variant", ["cnn_gru", "mlp_encoder", "rma"])
def test_variant_trains(variant):
    env = make_env()
    if variant == "rma":
        ac = ActorCriticRMA(num_obs=env.num_obs,
                            num_privileged_obs=env.num_privileged_obs,
                            num_obs_history=env.num_obs_history,
                            num_actions=env.num_actions, args=ACRmaArgs())
    else:
        args = ACCnnArgs(use_cnn=variant.startswith("cnn"),
                         use_gru=(variant == "cnn_gru"),
                         height_map_shape=(2, 10, 11))
        ac = ActorCriticCNN(num_obs=env.num_obs,
                            num_privileged_obs=env.num_privileged_obs,
                            num_obs_history=env.num_obs_history,
                            num_actions=env.num_actions, args=args)
    alg, ts = run_one_iteration(env, ac)
    # student inference path works
    obs = jax.jit(env.observe)(env.reset_fn(jax.random.key(3), False))
    a = alg.act_inference(ts.params, obs["obs"], obs["obs_history"])
    assert a.shape == (4, 12)
    assert bool(jnp.all(jnp.isfinite(a)))
