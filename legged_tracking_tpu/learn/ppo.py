"""PPO with concurrent state estimation — one jitted train iteration.

Functional re-expression of ``go1_gym_learn/ppo_cse/ppo.py`` +
``rollout_storage.py``: rollout (T=24 steps via ``lax.scan`` over the fused
env step), GAE returns, and the clipped-surrogate update with the adaptive-KL
learning rate and the adaptation-module (CSE) supervised loss — all inside a
single ``train_iteration`` jit so a full PPO iteration is ONE device program
(the reference crosses the host boundary hundreds of times per iteration).

Semantics parity notes:
- timeout bootstrap: ``rew += gamma * value * time_out`` (ppo.py:86-89)
- GAE with advantage normalization over the whole buffer (rollout_storage.py:76-90)
- ONE random permutation shared across epochs (rollout_storage.py:102)
- adaptive LR per minibatch: /1.5 if KL > 2*desired, *1.5 if < desired/2,
  clamped to [1e-5, 1e-2] (ppo.py:112-124)
- adaptation loss: MSE(adaptation(obs_history), true priv) on the first 80%
  of each minibatch, test loss on the rest (ppo.py:164-185), separate Adam
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .actor_critic import (ActorCriticCSE, normal_entropy, normal_kl,
                           normal_log_prob)
from .utils import RunningMeanStd


def _cheap_perm(key, B: int, T: int, N: int):
    """O(B) bijective shuffle of [0, B) without the O(B log B) sort.

    ``jax.random.permutation`` sorts B random keys on device — the dominant
    superlinear term of the PPO data path at large env counts
    (docs/CHIP_RUNBOOK.md env-count knee).  This replaces it with
    affine -> (t,n) digit-swap -> affine, a measure-preserving composition:
    every index appears exactly once (multipliers are drawn coprime to B via
    a 128-candidate gcd window — static B, so the window is trace-time
    cheap), and the digit swap breaks the arithmetic-progression structure a
    single affine map would leave within minibatches.  Multiplier magnitude
    is capped so a*s stays inside int32.  Weaker mixing than a uniform
    permutation, but minibatch SGD needs exactly-once coverage plus
    (t, env)-decorrelation, both of which this provides; BENCH_SHUFFLE=0 /
    PPOArgs.cheap_shuffle=False restores the reference-equivalent sort.
    """
    ks = jax.random.split(key, 4)
    amax = max(3, min((2**31 - 1 - B) // max(B, 1), 1 << 20))

    def draw_mult(k):
        a0 = jax.random.randint(k, (), 2, amax)
        cand = a0 + jnp.arange(128, dtype=jnp.int32)
        ok = jnp.gcd(cand, jnp.int32(B)) == 1
        return jnp.where(jnp.any(ok), cand[jnp.argmax(ok)], jnp.int32(1))

    a1, a2 = draw_mult(ks[0]), draw_mult(ks[1])
    c1 = jax.random.randint(ks[2], (), 0, B, dtype=jnp.int32)
    c2 = jax.random.randint(ks[3], (), 0, B, dtype=jnp.int32)
    s = jnp.arange(B, dtype=jnp.int32)
    p = (a1 * s + c1) % B
    p = (p % N) * T + (p // N)          # digit swap: bijection since B = T*N
    return (a2 * p + c2) % B


@dataclass
class PPOArgs:
    """PPO_Args parity (ppo_cse/ppo.py:13-30)."""
    value_loss_coef: float = 1.0
    use_clipped_value_loss: bool = True
    clip_param: float = 0.2
    entropy_coef: float = 0.01
    num_learning_epochs: int = 5
    num_mini_batches: int = 4
    learning_rate: float = 1e-3
    adaptation_module_learning_rate: float = 1e-3
    num_adaptation_module_substeps: int = 1
    schedule: str = "adaptive"
    gamma: float = 0.99
    lam: float = 0.95
    desired_kl: float = 0.01
    # clamp window of the adaptive-KL learning rate (reference hard-codes
    # [1e-5, 1e-2], ppo.py:113-120); a lower ceiling damps the
    # reached-rate oscillation seen on long runs (TRAINING_NOTES.md)
    min_adaptive_lr: float = 1e-5
    max_adaptive_lr: float = 1e-2
    max_grad_norm: float = 1.0
    num_steps_per_env: int = 24
    # round-5 batch-superlinearity levers (docs/CHIP_RUNBOOK.md env-count
    # knee): replace the O(B log B) device sort behind
    # jax.random.permutation with an O(B) bijection (measured NEUTRAL at
    # 4096 envs — 364.1k vs 363.6k; default OFF because the affine perm's
    # structured minibatch-to-shard groupings amplify cross-device
    # reduction-order noise ~4x, 7.2e-4 vs 1.8e-4 post-update param
    # delta over 2 iterations, beyond the repo's 2e-4 sharding-invariance
    # bar — tests/test_distributed.py::test_update_path_invariance; flip
    # ON when batch is huge and strict layout invariance is not needed),
    # and optionally stop storing the
    # K-times-redundant obs-history frames in the rollout buffer (windows
    # re-gathered contiguously at minibatch assembly — bitwise-equal
    # histories + tests, but the gather MEASURED -5.5% at 4096 envs, so
    # default OFF; the K x rollout-buffer memory saving makes it the knob
    # to flip first when HBM, not time, is the binding constraint — e.g.
    # very large env counts or long histories). windowed_history
    # auto-disables under normalize_obs (stored histories there are
    # whitened with per-step running stats a post-hoc gather cannot
    # replay).
    cheap_shuffle: bool = False
    windowed_history: bool = False
    # eval split: trailing cfg.env.num_eval_envs envs act with the
    # deterministic teacher instead of the student (Runner.learn eval_expert,
    # ppo_cse/__init__.py:120,163-167)
    eval_expert: bool = False


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    adapt_opt_state: Any
    learning_rate: jnp.ndarray  # () dynamic (adaptive-KL)
    iteration: jnp.ndarray      # () int32
    obs_rms: Any = None         # RunningMeanStd over obs_history (normalize_obs)


class Transition(NamedTuple):
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    obs_history: jnp.ndarray
    actions: jnp.ndarray
    rewards: jnp.ndarray
    dones: jnp.ndarray
    values: jnp.ndarray
    log_prob: jnp.ndarray
    mu: jnp.ndarray
    sigma: jnp.ndarray


class PPO:
    """Builds the jitted train iteration around an env's pure step_fn."""

    def __init__(self, env, ac_args=None, args: PPOArgs | None = None, ac=None):
        from .actor_critic import ACArgs
        self.env = env
        self.args = args or PPOArgs()
        # any module exposing the policy protocol works here: action_dist /
        # evaluate / adapt / adaptation_target / act_student (CSE, CNN, RMA)
        self.ac = ac if ac is not None else ActorCriticCSE(
            num_obs=env.num_obs,
            num_privileged_obs=env.num_privileged_obs,
            num_obs_history=env.num_obs_history,
            num_actions=env.num_actions,
            args=ac_args or ACArgs(),
        )
        self._m = type(self.ac)
        self.normalize_obs = bool(getattr(getattr(self.ac, "args", None),
                                          "normalize_obs", False))
        # windowed history storage (PPOArgs.windowed_history): valid only
        # when stored histories are raw bf16 windows of raw frames
        self._window_history = (self.args.windowed_history
                                and not self.normalize_obs)
        # train/eval env split (reference BaseTask, base_task.py:44-49): the
        # trailing num_eval_envs envs act deterministically (student or
        # teacher) and are EXCLUDED from GAE/updates — a held-out on-device
        # eval population.  Static slice boundary, so everything stays jittable.
        self.n_eval = int(getattr(env.cfg.env, "num_eval_envs", 0))
        self.n_train = env.num_envs - self.n_eval
        # rehearsal-mixing split (cl_dist_mix, config.py): the LEADING n_mix
        # train envs run easier rehearsal distances; curriculum gating reads
        # the frontier_* metrics over the complementary slice
        ct = getattr(env.cfg, "curriculum_thresholds", None)
        mix = float(getattr(ct, "cl_dist_mix", 0.0)) if ct is not None else 0.0
        self.n_mix = int(round(mix * self.n_train))
        # optimizers: dynamic-lr Adam for PPO; fixed-lr Adam for adaptation.
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.args.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=self.args.learning_rate),
        )
        self.adapt_tx = optax.adam(self.args.adaptation_module_learning_rate)
        # NB: only train_state is donated. env_state/obs_dict leaves can alias
        # each other (e.g. obs_history == obs for history length 1; XLA may
        # alias identical outputs of the producing jit) and donating an aliased
        # buffer twice is an XLA error.
        self._train_iteration = jax.jit(self.train_iteration,
                                        donate_argnums=(0,),
                                        static_argnames=("update_model",))
        # critic-only warmup (resume-shock mitigation, TRAINING_NOTES.md):
        # value-loss-only updates restricted to the critic head so a resumed
        # value function can re-fit the fresh env distribution before any
        # policy gradient flows (the shared height-map encoder stays frozen).
        # Fresh full-tree Adam + zeroed non-critic grads == exact masking
        # (zero grad + zero moments -> zero update), leaving the resumed
        # optimizer moments untouched for the main run.
        self.warmup_tx = optax.chain(
            optax.clip_by_global_norm(self.args.max_grad_norm),
            optax.adam(self.args.learning_rate))
        self._warmup_iteration = jax.jit(self.warmup_iteration,
                                         donate_argnums=(0, 4))

    def init(self, key) -> TrainState:
        dummy_o = jnp.zeros((1, self.env.num_obs))
        dummy_h = jnp.zeros((1, self.env.num_obs_history))
        dummy_p = jnp.zeros((1, self.env.num_privileged_obs))
        params = self.ac.init(key, dummy_o, dummy_p, dummy_h)
        # canonicalize every leaf to a strong-typed device array: optax.init
        # leaves python/weak-typed scalars (e.g. inject_hyperparams' lr) whose
        # pytree signature differs from the returned state, which would force
        # a silent recompile of the train iteration on its SECOND call.
        canon = lambda t: jax.tree.map(jnp.asarray, t)
        return TrainState(
            params=canon(params),
            opt_state=canon(self.tx.init(params)),
            adapt_opt_state=canon(self.adapt_tx.init(params)),
            learning_rate=jnp.asarray(self.args.learning_rate, jnp.float32),
            iteration=jnp.zeros((), jnp.int32),
            obs_rms=(RunningMeanStd.create((self.env.num_obs_history,))
                     if self.normalize_obs else None),
        )

    # ------------------------------------------------------------- rollout
    def rollout(self, params, env_state, obs_dict, key, obs_rms=None):
        """T steps of (act -> env.step -> store) under lax.scan
        (Runner.learn inner loop, ppo_cse/__init__.py:137-178).  ``obs_dict``
        is carried across iterations like the reference's persistent obs.

        With normalize_obs (AC_Args parity, actor_critic.py:126-129) the
        obs-history stream is whitened by a running mean/std updated each step;
        NORMALIZED histories are stored, so the update consumes them as-is."""
        T = self.args.num_steps_per_env

        def step(carry, key_t):
            env_state, obs_dict, obs_rms = carry
            o = obs_dict["obs"]
            h = obs_dict["obs_history"]
            p = obs_dict["privileged_obs"]
            if self.normalize_obs:
                # stats accumulate in f32 (update() upcasts); the whitened
                # stream goes back to bf16 — its only consumers are bf16 MXU
                # matmuls and the rollout buffer, which stays half-width
                h = obs_rms.normalize(h).astype(obs_dict["obs_history"].dtype)
                obs_rms = obs_rms.update(obs_dict["obs_history"])
            mean, std = self.ac.apply(params, o, p, h, method=self._m.action_dist)
            std = jnp.broadcast_to(std, mean.shape)
            actions = mean + std * jax.random.normal(key_t, mean.shape)
            if self.n_eval:
                # trailing eval envs act deterministically (Runner.learn,
                # ppo_cse/__init__.py:160-167): student by default, teacher
                # with eval_expert
                if self.args.eval_expert:
                    a_det = self.ac.apply(params, o, p, h,
                                          method=self._m.act_teacher)
                else:
                    a_det = self.ac.apply(params, o, h,
                                          method=self._m.act_student)
                is_eval = (jnp.arange(actions.shape[0]) >= self.n_train)[:, None]
                actions = jnp.where(is_eval, a_det, actions)
            log_prob = normal_log_prob(mean, std, actions)
            value = self.ac.apply(params, o, p, h, method=self._m.evaluate)
            new_env_state, out = self.env.step_fn(env_state, actions)
            # timeout bootstrap (ppo_cse/ppo.py:86-89)
            rew = out.rew + self.args.gamma * value * out.info["time_outs"]
            # windowed mode: h is reconstructible from (h0, traj.obs) at
            # minibatch assembly — store a 0-width placeholder instead of
            # the K-frames-redundant (N, K*num_obs) row
            h_store = (jnp.zeros((h.shape[0], 0), h.dtype)
                       if self._window_history else h)
            tr = Transition(obs=o, privileged_obs=p, obs_history=h_store,
                            actions=actions, rewards=rew, dones=out.done,
                            values=value, log_prob=log_prob, mu=mean, sigma=std)
            metrics_t = {
                "done": out.done,
                "episode_sums": out.info["episode_sums"],
                "episode_length": out.info["episode_length"],
                "reached": out.info["reached"],
                "goal_distance": out.info["goal_distance"],
                # env0 kinematic frame for training-time video (the TPU-native
                # analogue of the reference's camera capture during training,
                # ppo_cse/__init__.py:322-345): 19 floats/step, rendered
                # offline by the runner every save_video_interval iterations.
                "video": {
                    "base_pos": new_env_state.phys.base_pos[0],
                    "base_quat": new_env_state.phys.base_quat[0],
                    "qj": new_env_state.phys.qj[0],
                },
            }
            next_obs = {"obs": out.obs, "privileged_obs": out.privileged_obs,
                        "obs_history": out.obs_history}
            return (new_env_state, next_obs, obs_rms), (tr, metrics_t)

        keys = jax.random.split(key, T)
        (env_state, last_obs, obs_rms), (traj, metrics) = jax.lax.scan(
            step, (env_state, obs_dict, obs_rms), keys)
        return env_state, last_obs, traj, metrics, obs_rms

    # ----------------------------------------------------------------- GAE
    def compute_gae(self, traj: Transition, last_values):
        """(rollout_storage.compute_returns, :76-90)."""
        g, lam = self.args.gamma, self.args.lam

        def scan_fn(adv, t):
            rew, done, value, next_value = t
            nonterm = 1.0 - done
            delta = rew + nonterm * g * next_value - value
            adv = delta + nonterm * g * lam * adv
            return adv, adv

        next_values = jnp.concatenate([traj.values[1:], last_values[None]], axis=0)
        _, advs = jax.lax.scan(
            scan_fn, jnp.zeros_like(last_values),
            (traj.rewards, traj.dones.astype(jnp.float32), traj.values, next_values),
            reverse=True)
        returns = advs + traj.values
        norm_advs = (advs - advs.mean()) / (advs.std() + 1e-8)
        return returns, norm_advs

    # ---------------------------------------------------- history windows
    def _window_histories(self, h_first, s0, obs_frames, perm, N):
        """Reconstruct (B, K*num_obs) obs-history rows for permuted samples.

        History semantics carry across auto-resets (reference
        HistoryWrapper.step, history_wrapper.py:18-24 — the window shifts
        unconditionally, no done masking), so each row is ONE contiguous
        (K, num_obs) slice of an env-major frame buffer — a granule-sized
        gather instead of storing the K-times-redundant history rows in
        the rollout buffer.

        Stream subtlety (bitwise-critical): observe() appends the acting
        obs to the history WITHOUT persisting it to EnvState, so at an
        observe-started iteration the step-0 history ``h_first`` is
        "virtual" (its newest frame f_0 never enters the persisted
        stream), while at step-started iterations h_first IS the persisted
        state row ``s0``.  Both cases collapse onto one gather source
            F = [ h_first (K blocks) | s0 blocks 1..K-1 | f_1 .. f_{T-1} ]
        with start 0 for t = 0 rows (the exact acting history) and
        K + t - 1 otherwise (h_t = [s0_t .. s0_{K-1}, f_1 .. f_t]).
        Verified bitwise against stored rows in tests/test_round5_paths.py.
        """
        no = self.env.num_obs
        K = h_first.shape[-1] // no
        Nn = h_first.shape[0]
        t_idx = perm // N
        n_idx = perm % N
        F = jnp.concatenate(
            [h_first.reshape(Nn, K, no),
             s0.reshape(Nn, K, no)[:, 1:].astype(h_first.dtype),
             jnp.moveaxis(obs_frames[1:], 0, 1).astype(h_first.dtype)],
            axis=1)                                        # (N, 2K-2+T, no)
        # (1, K, no) slice gather.  Geometry note (round-5 chip A/B at 4096
        # envs): this 3-D slice form measured 343.5k env-steps/s; a
        # "simpler" flattened (1, K*no) slice over (N, L*no) measured
        # 178.3k — the flat slices straddle lane-tile boundaries at stride
        # no=261, while this form keeps the no axis tile-aligned.
        start_t = jnp.where(t_idx == 0, 0, K + t_idx - 1)
        starts = jnp.stack([n_idx, start_t], axis=1)       # (B, 2)
        win = jax.lax.gather(
            F, starts,
            dimension_numbers=jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2), collapsed_slice_dims=(0,),
                start_index_map=(0, 1)),
            slice_sizes=(1, K, no),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # (B, K, no)
        return win.reshape(win.shape[0], K * no)

    def _perm(self, key, Bp, T, N):
        if not self.args.cheap_shuffle:
            return jax.random.permutation(key, Bp)
        if Bp == T * N:
            return _cheap_perm(key, Bp, T, N)
        return _cheap_perm(key, Bp, 1, Bp)

    # -------------------------------------------------------------- update
    def _minibatch_update(self, carry, batch):
        params, opt_state, adapt_opt_state, lr = carry
        a = self.args
        o, h, p, actions, target_values, advantages, returns, old_lp, old_mu, old_sigma = batch

        def loss_fn(prms):
            mean, std = self.ac.apply(prms, o, p, h, method=self._m.action_dist)
            log_prob = normal_log_prob(mean, std, actions)
            value = self.ac.apply(prms, o, p, h, method=self._m.evaluate)
            entropy = normal_entropy(std)

            ratio = jnp.exp(log_prob - old_lp)
            surr = -advantages * ratio
            surr_clipped = -advantages * jnp.clip(ratio, 1.0 - a.clip_param, 1.0 + a.clip_param)
            surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))

            if a.use_clipped_value_loss:
                v_clipped = target_values + jnp.clip(value - target_values,
                                                     -a.clip_param, a.clip_param)
                v_loss = jnp.mean(jnp.maximum(jnp.square(value - returns),
                                              jnp.square(v_clipped - returns)))
            else:
                v_loss = jnp.mean(jnp.square(returns - value))

            loss = surrogate_loss + a.value_loss_coef * v_loss - a.entropy_coef * jnp.mean(entropy)
            kl = jnp.mean(normal_kl(old_mu, old_sigma, mean, std))
            return loss, (surrogate_loss, v_loss, kl)

        (loss, (surr_l, v_l, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        # adaptive-KL LR (ppo.py:110-124), applied to THIS minibatch's step
        if a.desired_kl is not None and a.schedule == "adaptive":
            lr = jnp.where(kl > a.desired_kl * 2.0,
                           jnp.maximum(a.min_adaptive_lr, lr / 1.5), lr)
            lr = jnp.where((kl < a.desired_kl / 2.0) & (kl > 0.0),
                           jnp.minimum(a.max_adaptive_lr, lr * 1.5), lr)
        inject = opt_state[1]._replace(
            hyperparams={**opt_state[1].hyperparams, "learning_rate": lr})
        updates, opt_state_new = self.tx.update(grads, (opt_state[0], inject), params)
        params = optax.apply_updates(params, updates)

        # adaptation-module substep (ppo.py:160-190): 80/20 train/test split
        n_train = h.shape[0] // 5 * 4

        def adapt_loss_fn(prms):
            pred = self.ac.apply(prms, h, method=self._m.adapt)
            target = jax.lax.stop_gradient(
                self.ac.apply(prms, p, method=self._m.adaptation_target))
            train_loss = jnp.mean(jnp.square(pred[:n_train] - target[:n_train]))
            test_loss = jnp.mean(jnp.square(pred[n_train:] - target[n_train:]))
            return train_loss, test_loss

        ad_loss = ad_test = jnp.zeros(())
        for _ in range(a.num_adaptation_module_substeps):
            (ad_loss, ad_test), ad_grads = jax.value_and_grad(
                adapt_loss_fn, has_aux=True)(params)
            ad_updates, adapt_opt_state = self.adapt_tx.update(
                ad_grads, adapt_opt_state, params)
            params = optax.apply_updates(params, ad_updates)

        stats = jnp.stack([v_l, surr_l, ad_loss, ad_test, kl])
        return (params, opt_state_new, adapt_opt_state, lr), stats

    def update(self, train_state: TrainState, traj: Transition, returns,
               advantages, key, h0=None):
        a = self.args
        T, N = traj.rewards.shape
        B = T * N
        mb = B // a.num_mini_batches
        perm = self._perm(key, a.num_mini_batches * mb, T, N)

        flat = lambda x: x.reshape((B,) + x.shape[2:])
        grp = lambda x: x.reshape((a.num_mini_batches, mb) + x.shape[1:])

        # same permutation every epoch (rollout_storage.py:102): gather the
        # buffer into permuted layout ONCE, then each epoch's minibatches are
        # contiguous slices — 1 gather of the ~200 MB buffer instead of
        # epochs x num_mb partial gathers.  Histories are reconstructed as
        # frame windows directly in permuted order (_window_histories).
        if self._window_history:
            h_first, s0 = h0
            h_data = grp(self._window_histories(h_first, s0, traj.obs,
                                                perm, N))
        else:
            h_data = grp(flat(traj.obs_history)[perm])
        others = (flat(traj.obs), flat(traj.privileged_obs),
                  flat(traj.actions), flat(traj.values), flat(advantages),
                  flat(returns), flat(traj.log_prob), flat(traj.mu),
                  flat(traj.sigma))
        others = jax.tree.map(lambda x: grp(x[perm]), others)
        data = (others[0], h_data, others[1], others[2], others[3],
                others[4], others[5], others[6], others[7], others[8])

        # scan over EPOCHS with the minibatch loop unrolled: a traced
        # minibatch index forces a dynamic-slice COPY of each ~200 MB
        # minibatch (20 x 0.63 ms/iter in device traces); static slices fuse
        # into their consumer matmuls instead. Update order is unchanged.
        def epoch_body(carry, _):
            stats_e = []
            for i in range(a.num_mini_batches):
                batch = jax.tree.map(lambda x: x[i], data)
                carry, s = self._minibatch_update(carry, batch)
                stats_e.append(s)
            return carry, jnp.stack(stats_e)

        carry = (train_state.params, train_state.opt_state,
                 train_state.adapt_opt_state, train_state.learning_rate)
        carry, stats = jax.lax.scan(epoch_body, carry, None,
                                    length=a.num_learning_epochs)
        params, opt_state, adapt_opt_state, lr = carry
        mean_stats = jnp.mean(stats, axis=(0, 1))
        metrics = {
            "value_loss": mean_stats[0],
            "surrogate_loss": mean_stats[1],
            "adaptation_loss": mean_stats[2],
            "adaptation_test_loss": mean_stats[3],
            "kl_mean": mean_stats[4],
            "learning_rate": lr,
        }
        return TrainState(params=params, opt_state=opt_state,
                          adapt_opt_state=adapt_opt_state, learning_rate=lr,
                          iteration=train_state.iteration + 1), metrics

    # ------------------------------------------------- critic-only warmup
    def _mask_to_critic(self, grads):
        """Zero every gradient leaf outside the critic head ('critic_body' in
        all policy variants), keeping the actor / adaptation / std / any
        shared encoder bitwise frozen during warmup."""
        def mask_top(path_key, subtree):
            keep = path_key == "critic_body"
            return jax.tree.map(lambda g: g if keep else jnp.zeros_like(g),
                                subtree)
        inner = {k: mask_top(k, v) for k, v in grads["params"].items()}
        return {**grads, "params": inner}

    def warmup_iteration(self, train_state: TrainState, env_state, obs_dict,
                         key, warmup_opt_state):
        """One rollout + value-loss-only update touching ONLY critic_body.

        Resume-shock mitigation (docs/TRAINING_NOTES.md): a resumed value
        function meets a fresh env distribution (staggered countdowns, goal
        resampling) and its first clipped updates drag the policy through any
        shared encoder.  Warmup lets the critic (and obs_rms) re-fit first;
        the action distribution is provably unchanged (tests/test_ppo.py)."""
        a = self.args
        k_roll, k_update = jax.random.split(key)
        s0_hist = env_state.obs_history if self._window_history else None
        env_state, last_obs, traj, roll_metrics, obs_rms = self.rollout(
            train_state.params, env_state, obs_dict, k_roll,
            train_state.obs_rms)
        last_h = (obs_rms.normalize(last_obs["obs_history"])
                  if self.normalize_obs else last_obs["obs_history"])
        last_values = self.ac.apply(train_state.params, last_obs["obs"],
                                    last_obs["privileged_obs"], last_h,
                                    method=self._m.evaluate)
        if self.n_eval:
            traj = jax.tree.map(lambda x: x[:, :self.n_train], traj)
            last_values = last_values[:self.n_train]
        returns, _ = self.compute_gae(traj, last_values)

        T, N = traj.rewards.shape
        B = T * N
        mb = B // a.num_mini_batches
        perm = self._perm(k_update, a.num_mini_batches * mb, T, N)
        flat = lambda x: x.reshape((B,) + x.shape[2:])
        grp = lambda x: x.reshape((a.num_mini_batches, mb) + x.shape[1:])
        if self._window_history:
            h_data = grp(self._window_histories(
                obs_dict["obs_history"][:N], s0_hist[:N], traj.obs, perm, N))
        else:
            h_data = grp(flat(traj.obs_history)[perm])
        others = jax.tree.map(
            lambda x: grp(x[perm]),
            (flat(traj.obs), flat(traj.privileged_obs), flat(traj.values),
             flat(returns)))
        data = (others[0], h_data, others[1], others[2], others[3])

        def minibatch(carry, batch):
            params, wopt = carry
            o, h, p, target_values, rets = batch

            def loss_fn(prms):
                value = self.ac.apply(prms, o, p, h, method=self._m.evaluate)
                if a.use_clipped_value_loss:
                    v_clipped = target_values + jnp.clip(
                        value - target_values, -a.clip_param, a.clip_param)
                    return jnp.mean(jnp.maximum(
                        jnp.square(value - rets), jnp.square(v_clipped - rets)))
                return jnp.mean(jnp.square(rets - value))

            v_l, grads = jax.value_and_grad(loss_fn)(params)
            grads = self._mask_to_critic(grads)
            updates, wopt = self.warmup_tx.update(grads, wopt, params)
            params = optax.apply_updates(params, updates)
            return (params, wopt), v_l

        # static minibatch slices inside an epoch scan (see update())
        def epoch_body(carry, _):
            v_ls = []
            for i in range(a.num_mini_batches):
                carry, v_l = minibatch(carry, jax.tree.map(lambda x: x[i], data))
                v_ls.append(v_l)
            return carry, jnp.stack(v_ls)

        (params, warmup_opt_state), v_ls = jax.lax.scan(
            epoch_body, (train_state.params, warmup_opt_state), None,
            length=a.num_learning_epochs)
        train_state = train_state._replace(params=params)
        if self.normalize_obs:
            train_state = train_state._replace(obs_rms=obs_rms)
        metrics = {"value_loss": jnp.mean(v_ls)}
        return train_state, env_state, last_obs, metrics, warmup_opt_state

    def warmup_iteration_jit(self, train_state, env_state, obs_dict, key,
                             warmup_opt_state):
        return self._warmup_iteration(train_state, env_state, obs_dict, key,
                                      warmup_opt_state)

    # ------------------------------------------------------- one iteration
    def train_iteration(self, train_state: TrainState, env_state, obs_dict,
                        key, update_model: bool = True):
        """One rollout (+ update unless ``update_model`` is False — the
        reference's --freeze_model data-collection mode, scripts/train.py:278
        -> ppo_cse/__init__.py:176)."""
        k_roll, k_update = jax.random.split(key)
        # pre-rollout persisted history row (window reconstruction source)
        s0_hist = env_state.obs_history if self._window_history else None
        env_state, last_obs, traj, roll_metrics, obs_rms = self.rollout(
            train_state.params, env_state, obs_dict, k_roll,
            train_state.obs_rms)
        last_h = (obs_rms.normalize(last_obs["obs_history"])
                  if self.normalize_obs else last_obs["obs_history"])
        last_values = self.ac.apply(train_state.params, last_obs["obs"],
                                    last_obs["privileged_obs"],
                                    last_h,
                                    method=self._m.evaluate)
        if self.n_eval:
            # held-out eval envs never enter GAE or the update
            # (process_env_step slices [:num_train_envs], __init__.py:177-178)
            traj_train = jax.tree.map(lambda x: x[:, :self.n_train], traj)
            last_values = last_values[:self.n_train]
        else:
            traj_train = traj
        if update_model:
            returns, advantages = self.compute_gae(traj_train, last_values)
            h0 = ((obs_dict["obs_history"][:self.n_train],
                   s0_hist[:self.n_train])
                  if self._window_history else None)
            train_state, metrics = self.update(train_state, traj_train,
                                               returns, advantages, k_update,
                                               h0=h0)
        else:
            z = jnp.zeros(())
            metrics = {"value_loss": z, "surrogate_loss": z,
                       "adaptation_loss": z, "adaptation_test_loss": z,
                       "kl_mean": z,
                       "learning_rate": train_state.learning_rate}
        if self.normalize_obs:
            train_state = train_state._replace(obs_rms=obs_rms)

        # episodic metrics: done-masked means over the rollout window,
        # train/eval populations reported separately (rewbuffer vs
        # rewbuffer_eval, ppo_cse/__init__.py:137-140,200-214)
        def ep_metrics(sl, prefix=""):
            done = roll_metrics["done"][:, sl]            # (T, n)
            n_done = jnp.maximum(jnp.sum(done), 1)
            dmask = done.astype(jnp.float32)
            dmean = lambda x: jnp.sum(x[:, sl] * dmask) / n_done
            ep_sums = roll_metrics["episode_sums"][:, sl]  # (T, n, K)
            metrics[prefix + "num_episodes"] = jnp.sum(done)
            metrics[prefix + "episode_sums_mean"] = (
                jnp.sum(ep_sums * dmask[..., None], axis=(0, 1)) / n_done)
            metrics[prefix + "episode_length_mean"] = dmean(
                roll_metrics["episode_length"].astype(jnp.float32))
            metrics[prefix + "reached_mean"] = dmean(
                roll_metrics["reached"].astype(jnp.float32))
            metrics[prefix + "goal_distance_mean"] = dmean(
                roll_metrics["goal_distance"])

        metrics["video"] = roll_metrics["video"]
        metrics["mean_reward_per_step"] = jnp.mean(traj_train.rewards)
        # policy-std telemetry (mean_noise_std, reference ppo_cse
        # __init__.py:307): diagnoses entropy-driven std inflation
        metrics["action_std_mean"] = jnp.mean(traj.sigma[-1])
        ep_metrics(slice(0, self.n_train))
        if self.n_mix:
            ep_metrics(slice(self.n_mix, self.n_train), prefix="frontier_")
        if self.n_eval:
            ep_metrics(slice(self.n_train, None), prefix="eval_")
        return train_state, env_state, last_obs, metrics

    def train_iteration_jit(self, train_state, env_state, obs_dict, key,
                            update_model: bool = True):
        return self._train_iteration(train_state, env_state, obs_dict, key,
                                     update_model=update_model)

    # ------------------------------------------------------------ policies
    def act_inference(self, params, obs, obs_history):
        """Student/deployment policy (act_student, actor_critic.py:144-148)."""
        return self.ac.apply(params, obs, obs_history, method=self._m.act_student)

    def act_teacher(self, params, obs, privileged_obs, obs_history):
        return self.ac.apply(params, obs, privileged_obs, obs_history,
                             method=self._m.act_teacher)
