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


@pytest.mark.parametrize("variant", ["cnn_gru", "rma", "mlp"])
def test_eval_reconstructs_family_from_checkpoint(variant, tmp_path):
    """scripts/eval.load_policy must rebuild the right actor-critic family
    from a checkpoint's param tree alone (reference eval.py:38-66)."""
    import os
    import pickle
    import sys

    env = make_env()
    if variant == "rma":
        ac = ActorCriticRMA(num_obs=env.num_obs,
                            num_privileged_obs=env.num_privileged_obs,
                            num_obs_history=env.num_obs_history,
                            num_actions=env.num_actions, args=ACRmaArgs())
    elif variant == "cnn_gru":
        ac = ActorCriticCNN(num_obs=env.num_obs,
                            num_privileged_obs=env.num_privileged_obs,
                            num_obs_history=env.num_obs_history,
                            num_actions=env.num_actions,
                            args=ACCnnArgs(use_cnn=True, use_gru=True,
                                           height_map_shape=(2, 10, 11)))
    else:
        ac = None  # default CSE MLP
    alg = PPO(env, args=PPOArgs(), ac=ac)
    ts = alg.init(jax.random.key(0))
    params_np = jax.tree.map(np.asarray, ts.params)
    with open(os.path.join(tmp_path, "ac_weights_last.pkl"), "wb") as f:
        pickle.dump({"params": params_np}, f)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from eval import load_policy
    alg2, params2, policy = load_policy(env, str(tmp_path))
    assert type(alg2.ac).__name__ == type(alg.ac).__name__
    obs = jax.jit(env.observe)(env.reset_fn(jax.random.key(1), False))
    a = policy(obs["obs"], obs["obs_history"])
    ref = alg.act_inference(ts.params, obs["obs"], obs["obs_history"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("use_gru", [True, False])
def test_gru_recurrence_is_live(use_gru):
    """The GRU variant must carry memory across the history frames: a change
    to the OLDEST frame reaches the policy output through the recurrent
    latent (reference ppo_cse_cnn actor_critic.py:100-105,179-198), whereas
    the MLP-encoder variant consumes only the LAST frame and must be exactly
    invariant to older frames."""
    num_obs, num_priv, num_actions, H = 261, 8, 12, 3
    ac = ActorCriticCNN(num_obs=num_obs, num_privileged_obs=num_priv,
                        num_obs_history=H * num_obs, num_actions=num_actions,
                        args=ACCnnArgs(use_cnn=True, use_gru=use_gru,
                                       height_map_shape=(2, 10, 11)))
    k = jax.random.key(0)
    o = jax.random.normal(k, (2, num_obs))
    p = jax.random.normal(k, (2, num_priv))
    h = jax.random.normal(k, (2, H * num_obs))
    params = ac.init(jax.random.key(1), o, p, h)
    h2 = h.at[:, :num_obs].add(1.0)   # perturb the oldest frame only
    m0, _ = ac.apply(params, o, p, h, method=ac.action_dist)
    m1, _ = ac.apply(params, o, p, h2, method=ac.action_dist)
    diff = float(jnp.max(jnp.abs(m0 - m1)))
    if use_gru:
        assert diff > 1e-6, "GRU latent ignored the oldest history frame"
    else:
        assert diff == 0.0, "MLP-encoder variant must use only the last frame"
