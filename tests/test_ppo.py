"""PPO learner tests: one fused iteration runs, params update, metrics finite."""

import jax
import jax.numpy as jnp
import numpy as np

from legged_tracking_tpu.config import Cfg, config_go1
from legged_tracking_tpu.envs import LeggedEnv
from legged_tracking_tpu.learn import PPO, PPOArgs


def make_env(num_envs=8):
    cfg = config_go1(Cfg())
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "plane"
    cfg.env.command_type = "xy"
    cfg.terrain.measure_front_half = True
    cfg.control.control_type = "P"
    cfg.env.episode_length_s = 2.0
    cfg.reward_scales.set("exploration_lin", 1.0)
    cfg.reward_scales.set("exploration_yaw", 0.4)
    cfg.control.decimation = 2  # halve physics compile cost
    return LeggedEnv(cfg)


def test_train_iteration():
    env = make_env()
    alg = PPO(env, args=PPOArgs(num_steps_per_env=8, num_mini_batches=2,
                                num_learning_epochs=2))
    ts = alg.init(jax.random.key(0))
    env_state = env.reset_fn(jax.random.key(1), False)
    obs = jax.jit(env.observe)(env_state)

    p0 = jax.tree.leaves(ts.params)[0].copy()
    ts2, env_state2, obs2, metrics = alg.train_iteration_jit(
        ts, env_state, obs, jax.random.key(2))
    video = metrics.pop("video")
    assert video["base_pos"].shape == (8, 3)  # (T, xyz) env0 frames
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), k
    # params actually moved
    p1 = jax.tree.leaves(ts2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # env advanced by T steps
    assert int(env_state2.common_step) == 8
    # a second iteration chains
    ts3, env_state3, obs3, metrics3 = alg.train_iteration_jit(
        ts2, env_state2, obs2, jax.random.key(3))
    assert bool(jnp.isfinite(metrics3["value_loss"]))


def test_eval_env_split():
    """Trailing num_eval_envs act deterministically and are excluded from the
    update (reference ppo_cse/__init__.py:160-178)."""
    env = make_env(num_envs=8)
    env.cfg.env.num_eval_envs = 4
    alg = PPO(env, args=PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                                num_learning_epochs=1))
    assert alg.n_train == 4 and alg.n_eval == 4
    ts = alg.init(jax.random.key(0))
    env_state = env.reset_fn(jax.random.key(1), False)
    obs = jax.jit(env.observe)(env_state)

    # same start, different action noise: eval actions identical, train differ
    roll = jax.jit(lambda k: alg.rollout(ts.params, env_state, obs, k,
                                         ts.obs_rms)[2].actions)
    a1, a2 = roll(jax.random.key(2)), roll(jax.random.key(3))
    assert np.allclose(np.asarray(a1[0, 4:]), np.asarray(a2[0, 4:]))
    assert not np.allclose(np.asarray(a1[0, :4]), np.asarray(a2[0, :4]))

    p0 = np.asarray(jax.tree.leaves(ts.params)[0]).copy()  # ts is donated below
    ts2, _, _, metrics = alg.train_iteration_jit(ts, env_state, obs,
                                                 jax.random.key(4))
    assert "eval_reached_mean" in metrics and "eval_episode_sums_mean" in metrics
    metrics.pop("video")
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(v))), k
    assert not np.allclose(p0, np.asarray(jax.tree.leaves(ts2.params)[0]))


def test_critic_warmup_freezes_policy():
    """warmup_iteration trains ONLY critic_body: the action distribution is
    bitwise unchanged while the value head moves (resume-shock mitigation,
    docs/TRAINING_NOTES.md)."""
    env = make_env(num_envs=8)
    alg = PPO(env, args=PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                                num_learning_epochs=2))
    ts = alg.init(jax.random.key(0))
    env_state = env.reset_fn(jax.random.key(1), False)
    obs = jax.jit(env.observe)(env_state)

    p0 = jax.tree.map(np.asarray, ts.params)
    wopt = jax.tree.map(jnp.asarray, alg.warmup_tx.init(ts.params))
    ts2, env_state2, obs2, wm, wopt = alg.warmup_iteration_jit(
        ts, env_state, obs, jax.random.key(2), wopt)
    assert bool(jnp.isfinite(wm["value_loss"]))
    p1 = jax.tree.map(np.asarray, ts2.params)
    for name, sub in p1["params"].items():
        before = p0["params"][name]
        same = all(np.array_equal(a, b) for a, b in
                   zip(jax.tree.leaves(before), jax.tree.leaves(sub)))
        if name == "critic_body":
            assert not same, "critic head should train during warmup"
        else:
            assert same, f"{name} must stay bitwise frozen during warmup"
    # std untouched too
    assert np.array_equal(p0["params"]["std"], p1["params"]["std"])
    # env advanced (warmup consumes real rollout steps)
    assert int(env_state2.common_step) == 4
    # a normal train iteration chains off the warmed-up state
    ts3, _, _, m3 = alg.train_iteration_jit(ts2, env_state2, obs2,
                                            jax.random.key(3))
    assert bool(jnp.isfinite(m3["value_loss"]))


def test_gae_matches_reference_recursion():
    """GAE vs a direct numpy port of rollout_storage.compute_returns (:76-90)."""
    env = make_env(num_envs=2)
    alg = PPO(env, args=PPOArgs(num_steps_per_env=5))
    T, N = 6, 3
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, N).astype(np.float32)
    dones = (rng.rand(T, N) < 0.2)
    values = rng.randn(T, N).astype(np.float32)
    last_values = rng.randn(N).astype(np.float32)

    from legged_tracking_tpu.learn.ppo import Transition
    traj = Transition(obs=None, privileged_obs=None, obs_history=None,
                      actions=None, rewards=jnp.asarray(rewards),
                      dones=jnp.asarray(dones), values=jnp.asarray(values),
                      log_prob=None, mu=None, sigma=None)
    returns, norm_adv = alg.compute_gae(traj, jnp.asarray(last_values))

    g, lam = alg.args.gamma, alg.args.lam
    adv = np.zeros(N, np.float32)
    ret_np = np.zeros((T, N), np.float32)
    for t in reversed(range(T)):
        nv = last_values if t == T - 1 else values[t + 1]
        nonterm = 1.0 - dones[t]
        delta = rewards[t] + nonterm * g * nv - values[t]
        adv = delta + nonterm * g * lam * adv
        ret_np[t] = adv + values[t]
    assert np.allclose(np.asarray(returns), ret_np, atol=1e-5)
    a = ret_np - values
    a = (a - a.mean()) / (a.std() + 1e-8)
    assert np.allclose(np.asarray(norm_adv), a, atol=1e-4)


def test_std_ceiling_breaks_inflation_loop():
    """ACArgs.max_noise_std caps the exploration std even under an
    entropy-dominated objective (the std-inflation loop that collapsed the
    goal recipe at ~it5200, docs/TRAINING_NOTES.md)."""
    from legged_tracking_tpu.learn.actor_critic import ACArgs

    env = make_env()
    alg = PPO(env, ac_args=ACArgs(max_noise_std=1.1),
              args=PPOArgs(num_steps_per_env=4, num_mini_batches=2,
                           num_learning_epochs=2, entropy_coef=10.0))
    ts = alg.init(jax.random.key(0))
    env_state = env.reset_fn(jax.random.key(1), False)
    obs = jax.jit(env.observe)(env_state)
    key = jax.random.key(2)
    for _ in range(3):
        key, k = jax.random.split(key)
        ts, env_state, obs, metrics = alg.train_iteration_jit(
            ts, env_state, obs, k)
    # effective (clamped) std saturates at the ceiling instead of inflating
    assert float(metrics["action_std_mean"]) <= 1.1 + 1e-5
    assert bool(jnp.isfinite(metrics["value_loss"]))
