"""Training runner: host loop around the jitted PPO iteration.

Mirrors the reference Runner (go1_gym_learn/ppo_cse/__init__.py:66-345):
learn() drives iterations, logs episodic metrics + fps, checkpoints every
``save_interval`` iterations, and applies the fix-target curriculum
(update_curriculum, legged_robot_trajectory_tracking.py:186-196) from the
device-side reached statistics.

One host<->device sync per iteration (the metrics fetch) — the entire
rollout+update is a single device program.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from collections import deque
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .actor_critic import ACArgs
from .ppo import PPO, PPOArgs


@dataclass
class RunnerArgs:
    """RunnerArgs parity (ppo_cse/__init__.py:47-64)."""
    num_steps_per_env: int = 24
    max_iterations: int = 1500
    save_interval: int = 400
    log_freq: int = 10
    resume: str = ""
    resume_curriculum: bool = True
    # training-time video of env0 (reference RunnerArgs.save_video_interval,
    # ppo_cse/__init__.py:58 + :322-345); 0 disables
    save_video_interval: int = 0
    video_frames: int = 250
    # resume-shock mitigation (docs/TRAINING_NOTES.md): run this many
    # critic-only warmup iterations after a --resume before any policy
    # gradient flows (value head re-fits the fresh env distribution; the
    # policy and any shared encoder stay bitwise frozen). 0 disables.
    critic_warmup_iters: int = 0


class Runner:
    def __init__(self, env, runner_args: RunnerArgs | None = None,
                 ppo_args: PPOArgs | None = None, ac_args: ACArgs | None = None,
                 logdir: str | None = None, log_wandb: bool = False, seed: int = 1,
                 ac=None, num_devices: int | None = None,
                 distributed: bool = False):
        self.env = env
        self.runner_args = runner_args or RunnerArgs()
        ppo_args = ppo_args or PPOArgs()
        ppo_args.num_steps_per_env = self.runner_args.num_steps_per_env
        self.alg = PPO(env, ac_args=ac_args, args=ppo_args, ac=ac)
        # data-parallel mesh: envs sharded, params replicated; XLA inserts the
        # psum gradient reductions (SURVEY.md §2.8 TPU-native equivalent —
        # over ICI within a host, DCN across hosts in the distributed case)
        self.mesh = None
        self.distributed = distributed
        self.process_index = 0
        if distributed:
            # caller must have run parallel.init_distributed() already; the
            # mesh spans every device of every process
            from ..parallel import global_mesh
            self.mesh = global_mesh()
            self.process_index = jax.process_index()
            # host-side artifacts (checkpoints, metrics.jsonl, video, config
            # snapshot) are process-0 responsibilities; all processes run the
            # identical device program + host curriculum arithmetic
            if self.process_index != 0:
                logdir = None
                log_wandb = False
        elif num_devices is not None and num_devices > 1:
            from ..parallel import make_mesh
            self.mesh = make_mesh(num_devices)
        self.logdir = logdir
        self.log_wandb = log_wandb
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            # config snapshot (parameters.pkl analogue, ppo_cse/__init__.py:81-84)
            with open(os.path.join(logdir, "parameters.pkl"), "wb") as f:
                pickle.dump(env.cfg, f)

        key = jax.random.key(seed)
        self.key, k_init, k_env = jax.random.split(key, 3)
        if self.distributed:
            # SPMD init: reset/observe run with global out-shardings so each
            # process materializes ONLY its addressable env shard (host-local
            # env state — nothing full-batch ever exists on one host); params
            # are built locally from the shared seed and lifted to a global
            # replicated array.
            from ..parallel import batch_sharding_tree, replicate_global
            self.train_state = replicate_global(self.alg.init(k_init), self.mesh)
            if self.runner_args.resume:
                self.load(self.runner_args.resume)
                self.train_state = replicate_global(
                    jax.tree.map(np.asarray, self.train_state), self.mesh)
            k_env = replicate_global(k_env, self.mesh)
            sds = jax.eval_shape(lambda k: env.reset_fn(k, True), k_env)
            out_sh = batch_sharding_tree(sds, env.num_envs, self.mesh)
            self.env_state = jax.jit(env.reset_fn, static_argnums=(1,),
                                     out_shardings=out_sh)(k_env, True)
        else:
            self.train_state = self.alg.init(k_init)
            if self.runner_args.resume:
                self.load(self.runner_args.resume)
            self.env_state = env._reset_jit(k_env, True)
        if getattr(self, "_pending_curriculum", None) is not None and \
                getattr(self.env_state, "curriculum_weights", None) is not None:
            self.env_state = self.env_state._replace(
                curriculum_weights=self._rep(self._pending_curriculum))
        if getattr(self, "_pending_target_dist", None) is not None:
            # resume fix-target curriculum progress (goal distance)
            self.env_state = self.env_state._replace(
                target_dist=self._rep(self._pending_target_dist))
        if self.distributed:
            from ..parallel import batch_sharding_tree
            osds = jax.eval_shape(env.observe, self.env_state)
            self.obs_dict = jax.jit(
                env.observe,
                out_shardings=batch_sharding_tree(osds, env.num_envs, self.mesh),
            )(self.env_state)
        else:
            self.obs_dict = env._observe_jit(self.env_state)
            if self.mesh is not None:
                from ..parallel import replicate, shard_batch
                self.train_state = replicate(self.train_state, self.mesh)
                self.env_state = shard_batch(self.env_state, env.num_envs,
                                             self.mesh)
                self.obs_dict = shard_batch(self.obs_dict, env.num_envs,
                                            self.mesh)
        self.tot_timesteps = 0
        self._reached_window = deque(maxlen=4000)
        self._video_buf = []
        # curriculum telemetry caches (reference ppo/metrics_caches.py:
        # DistCache for between-log running means, SlotCache per curriculum
        # category), drained into each logged record
        from .metrics_caches import DistCache, SlotCache
        self._dist_cache = DistCache()
        self._slot_cache = None
        cats = getattr(env, "category_names", None)
        if cats:
            self._slot_cache = SlotCache(len(cats))
        self.history = []
        # in-memory best-score snapshot (cl_restore_best_on_downstep + the
        # ac_weights_best.pkl files).  train_iteration donates its
        # train_state buffers, so a held reference would be DELETED on the
        # next iteration — snapshot and restore must deep-copy (one extra
        # params+optimizer copy of HBM, see _copy_state).
        self._best_score = (-1.0, -1.0)
        self._best_train_state = None
        self._best_it = -1
        self._best_target_dist = 0.0
        self._best_dirty = False
        self._restore_count = 0

    # --------------------------------------------------------------- helpers
    @staticmethod
    def _copy_state(ts):
        """Deep-copy a train_state's device buffers.  Needed because
        train_iteration_jit donates its train_state inputs: a snapshot held
        by reference is deleted one iteration later, and a restored snapshot
        would be consumed by the first post-restore iteration."""
        return jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, ts)

    def _rep(self, x, dtype=np.float32):
        """Host value → device array, replicated across every process's
        devices when the global mesh is active (host-written leaves like the
        fix-target distance must stay valid global-array inputs to the next
        multi-process train iteration)."""
        x = np.asarray(x, dtype)
        if self.distributed:
            from ..parallel import replicate_global
            return replicate_global(x, self.mesh)
        return jnp.asarray(x)

    # ------------------------------------------------------------------ io
    def save(self, path: str, train_state=None, target_dist=None):
        """Pickle a checkpoint.  train_state/target_dist default to the
        CURRENT state; the best-checkpoint path passes its retained snapshot
        (and that snapshot's curriculum distance) instead."""
        ts = self.train_state if train_state is None else train_state
        if target_dist is None:
            target_dist = (float(self.env_state.target_dist)
                           if self.env_state is not None else 0.0)
        params_np = jax.tree.map(np.asarray, ts.params)
        ckpt = {
            "params": params_np,
            "opt_state": jax.tree.map(np.asarray, ts.opt_state),
            "adapt_opt_state": jax.tree.map(np.asarray, ts.adapt_opt_state),
            "learning_rate": float(ts.learning_rate),
            "iteration": int(ts.iteration),
            "target_dist": float(target_dist),
        }
        # command-curriculum state (reference pickles curriculum distributions,
        # ppo_cse/__init__.py:224-239 / resume :97-104)
        if getattr(self.env_state, "curriculum_weights", None) is not None:
            ckpt["curriculum_weights"] = np.asarray(self.env_state.curriculum_weights)
        if ts.obs_rms is not None:
            ckpt["obs_rms"] = jax.tree.map(np.asarray, ts.obs_rms._asdict())
        with open(path, "wb") as f:
            pickle.dump(ckpt, f)

    def load(self, path: str):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.train_state = self.train_state._replace(
            params=jax.tree.map(jnp.asarray, ckpt["params"]),
            learning_rate=jnp.asarray(ckpt["learning_rate"]),
            iteration=jnp.asarray(ckpt["iteration"], jnp.int32))
        if "obs_rms" in ckpt and self.train_state.obs_rms is not None:
            from .utils import RunningMeanStd
            self.train_state = self.train_state._replace(
                obs_rms=RunningMeanStd(**jax.tree.map(jnp.asarray, ckpt["obs_rms"])))
        self._pending_curriculum = ckpt.get("curriculum_weights")             if self.runner_args.resume_curriculum else None
        # fix-target curriculum progress (goal distance) resumes too
        self._pending_target_dist = ckpt.get("target_dist")             if self.runner_args.resume_curriculum else None
        # Adam moments + adaptation optimizer resume (reference loads the full
        # optimizer state_dict, ppo_cse/__init__.py:97-104); older checkpoints
        # without them fall back to fresh moments.
        if "opt_state" in ckpt:
            self.train_state = self.train_state._replace(
                opt_state=jax.tree.map(jnp.asarray, ckpt["opt_state"]),
                adapt_opt_state=jax.tree.map(jnp.asarray,
                                             ckpt["adapt_opt_state"]))

    # ----------------------------------------------------------------- loop
    def learn(self, num_learning_iterations: int, eval_freq: int = 100,
              verbose: bool = True, profile_dir: str | None = None,
              update_model: bool = True):
        """Drive training iterations.

        profile_dir: capture a jax.profiler device trace of iterations 10-13
        (the TPU-native replacement for the reference's commented-out
        wall-clock probes, legged_robot_trajectory_tracking.py:79-105).
        update_model=False rolls out WITHOUT updating (reference
        --freeze_model, scripts/train.py:278 -> ppo_cse/__init__.py:176):
        episodic metrics log as usual, the PPO update, curriculum
        advancement and periodic checkpoints are skipped.
        """
        env = self.env
        cfg = env.cfg
        t0 = time.time()
        verbose = verbose and self.process_index == 0
        steps_per_iter = env.num_envs * self.alg.args.num_steps_per_env
        # critic-only warmup after a resume (resume-shock mitigation)
        wi = self.runner_args.critic_warmup_iters
        if wi > 0 and self.runner_args.resume:
            wopt = jax.tree.map(jnp.asarray,
                                self.alg.warmup_tx.init(self.train_state.params))
            if self.distributed:
                from ..parallel import replicate_global
                wopt = replicate_global(jax.tree.map(np.asarray, wopt), self.mesh)
            for w in range(wi):
                self.key, k = jax.random.split(self.key)
                if self.distributed:
                    k = replicate_global(k, self.mesh)
                (self.train_state, self.env_state, self.obs_dict, wm,
                 wopt) = self.alg.warmup_iteration_jit(
                    self.train_state, self.env_state, self.obs_dict, k, wopt)
                self.tot_timesteps += steps_per_iter
                if verbose and (w % self.runner_args.log_freq == 0 or w == wi - 1):
                    print(f"warmup {w:4d} | vloss {float(wm['value_loss']):.4f}")
        for it in range(num_learning_iterations):
            if profile_dir and it == 10:
                jax.profiler.start_trace(profile_dir, create_perfetto_trace=True)
            if profile_dir and it == 13:
                jax.block_until_ready(self.train_state.params)
                jax.profiler.stop_trace()
                print(f"profiler trace written to {profile_dir}")
            self.key, k = jax.random.split(self.key)
            if self.distributed:
                # every process splits the same host key chain; lift the
                # iteration key to a global replicated array
                from ..parallel import replicate_global
                k = replicate_global(k, self.mesh)
            self.train_state, self.env_state, self.obs_dict, metrics = \
                self.alg.train_iteration_jit(self.train_state, self.env_state,
                                             self.obs_dict, k,
                                             update_model=update_model)
            self.tot_timesteps += steps_per_iter

            video = metrics.pop("video", None)
            # training video needs a host fetch of env0 kinematics, which may
            # not be addressable from every process — off in distributed runs
            vint = (0 if self.distributed
                    else self.runner_args.save_video_interval)
            if vint and self.logdir and video is not None:
                # keep the trailing video_frames of env0's (T,·) kinematics as
                # device arrays (no host sync); render on video iterations
                self._video_buf.append(video)
                keep = max(self.runner_args.video_frames //
                           self.alg.args.num_steps_per_env + 1, 1)
                self._video_buf = self._video_buf[-keep:]
                if it % vint == 0 and it > 0:
                    self._write_training_video(it)

            # fix-target curriculum (reference update_curriculum, :186-196):
            # accumulate EVERY iteration — the reference pushes each episode's
            # outcome into a 4000-deep deque at reset time; gating this on the
            # log branch made the window fill log_freq x slower.  Cost: one
            # 2-scalar device fetch per iteration.
            if cfg.curriculum_thresholds.cl_fix_target and update_model:
                # with rehearsal mixing (cl_dist_mix) the gate reads the
                # frontier slice only — rehearsal success must not advance
                # (or hold back) the frontier distance
                n_eps = int(metrics.get("frontier_num_episodes",
                                        metrics["num_episodes"]))
                reach = float(metrics.get("frontier_reached_mean",
                                          metrics["reached_mean"]))
                if n_eps > 0:
                    self._reached_window.extend([reach] * n_eps)
                    # between-log running means (DistCache parity)
                    self._dist_cache.log(
                        reached=reach,
                        episodes_per_iter=float(n_eps))
                down = getattr(cfg.curriculum_thresholds,
                               "cl_downstep_threshold", 0.0)
                probe = int(getattr(cfg.curriculum_thresholds,
                                    "cl_stagnation_probe", 0))
                self._its_since_switch = getattr(
                    self, "_its_since_switch", 0) + 1
                win_full = len(self._reached_window) >= 4000
                win_mean = (np.mean(self._reached_window)
                            if self._reached_window else 0.0)
                if (win_full and win_mean >
                        cfg.curriculum_thresholds.cl_switch_threshold):
                    new_dist = min(
                        float(self.env_state.target_dist)
                        + cfg.curriculum_thresholds.cl_switch_delta,
                        cfg.curriculum_thresholds.cl_goal_target_dist)
                    self.env_state = self.env_state._replace(
                        target_dist=self._rep(new_dist))
                    self._reached_window.clear()
                    self._its_since_switch = 0
                elif down > 0.0 and win_full and win_mean < down:
                    # ease the task before the sparse-reward signal dies
                    cur_dist = float(self.env_state.target_dist)
                    new_dist = max(
                        cur_dist - cfg.curriculum_thresholds.cl_switch_delta,
                        cfg.curriculum_thresholds.cl_start_target_dist)
                    self.env_state = self.env_state._replace(
                        target_dist=self._rep(new_dist))
                    self._reached_window.clear()
                    self._its_since_switch = 0
                    if (getattr(cfg.curriculum_thresholds,
                                "cl_restore_best_on_downstep", False)
                            and self._best_train_state is not None
                            and new_dist < cur_dist - 1e-4
                            and self._best_score[1] >= down):
                        # (the 1e-4 slack matters: cur_dist round-trips
                        # through a float32 device scalar, so at the float
                        # floor 0.6 it reads 0.60000002384 — strictly
                        # greater than the python-double start distance —
                        # and an exact < fired a restore on every
                        # window-fill at the floor; real downsteps differ
                        # by cl_switch_delta >= 0.1)
                        # retention at the wall (TRAINING_NOTES round 5):
                        # a REAL downstep (distance actually eased) after a
                        # failed frontier excursion — resume the peak
                        # snapshot rather than re-training the eroded
                        # weights.  The two gates matter: while grinding at
                        # the START distance the window is naturally below
                        # the threshold, and an ungated restore rolls the
                        # policy back every window-fill (~25 iterations),
                        # which measurably PREVENTS bootstrapping (this
                        # session's first validation run: 17 restores by
                        # it 440, window stuck at 0.17 where the ungated
                        # baseline bootstraps).  Restoring to a snapshot
                        # whose own window never cleared the downstep bar
                        # would be equally pointless.
                        self.train_state = self._copy_state(
                            self._best_train_state)
                        self._restore_count += 1
                elif (probe > 0 and win_full
                      and win_mean >= max(
                          down,
                          cfg.curriculum_thresholds.cl_switch_threshold - 0.1)
                      and self._its_since_switch >= probe):
                    # stagnation probe (cl_stagnation_probe): the window has
                    # churned below the advance threshold for `probe`
                    # iterations — advance anyway, but only from STRENGTH
                    # (within 0.1 of the advance bar): the round-5 first run
                    # showed probes fired from a mediocre window (~0.55)
                    # erode the policy at the too-hard distance faster than
                    # the downstep can recover it. The downstep safety
                    # reverts over-reaches; best-checkpoint keeps the peak
                    new_dist = min(
                        float(self.env_state.target_dist)
                        + cfg.curriculum_thresholds.cl_switch_delta,
                        cfg.curriculum_thresholds.cl_goal_target_dist)
                    self.env_state = self.env_state._replace(
                        target_dist=self._rep(new_dist))
                    self._reached_window.clear()
                    self._its_since_switch = 0

            if (it % self.runner_args.log_freq == 0) or it == num_learning_iterations - 1:
                m = jax.tree.map(np.asarray, metrics)
                fps = self.tot_timesteps / (time.time() - t0)
                ep_means = dict(zip(["rew_" + n for n in env.metric_names],
                                    m.pop("episode_sums_mean")))
                if "eval_episode_sums_mean" in m:
                    # held-out eval-env population (rewbuffer_eval analogue)
                    ep_means.update(zip(
                        ["eval_rew_" + n for n in env.metric_names],
                        m.pop("eval_episode_sums_mean")))
                if "frontier_episode_sums_mean" in m:
                    # rehearsal-mix runs: per-term reward ledger of the
                    # frontier slice (the abstention-economics diagnostic)
                    ep_means.update(zip(
                        ["frontier_rew_" + n for n in env.metric_names],
                        m.pop("frontier_episode_sums_mean")))
                rec = {k2: float(v) for k2, v in m.items()}
                rec.update({k2: float(v) for k2, v in ep_means.items()})
                rec.update({"it": it, "fps": fps, "timesteps": self.tot_timesteps})
                if cfg.curriculum_thresholds.cl_fix_target:
                    rec["target_dist"] = float(self.env_state.target_dist)
                    rec["restored_best_total"] = self._restore_count
                for k2, v in self._dist_cache.get_summary().items():
                    rec["window_" + k2] = float(v)
                # command-curriculum telemetry: per-category SlotCache
                # (reference SlotCache slots = curriculum distributions)
                if getattr(self.env_state, "curriculum_weights", None) is not None:
                    w = np.asarray(self.env_state.curriculum_weights)
                    rec["curriculum_unlocked_frac"] = float((w > 0).mean())
                    rec["curriculum_weight_mean"] = float(w.mean())
                    if self._slot_cache is not None:
                        self._slot_cache.log(
                            unlocked_frac=(w > 0).mean(axis=1),
                            weight_mean=w.mean(axis=1))
                        for k2, v in self._slot_cache.get_summary().items():
                            for ci, cname in enumerate(self.env.category_names):
                                rec[f"curriculum_{k2}_{cname}"] = float(v[ci])
                self.history.append(rec)
                # best-score tracking: long sparse-reward runs erode past
                # their peak (docs/TRAINING_NOTES.md — both goal runs
                # decayed from ~it1400 with std FLAT, a frontier-erosion
                # mode distinct from std inflation).  Snapshot in memory on
                # EVERY log (feeds cl_restore_best_on_downstep even without
                # a logdir); files are written on save iterations below.
                if update_model:
                    win = rec.get("window_reached", rec.get("reached_mean"))
                    if win is not None:
                        # rank by distance only once the window clears 0.7
                        # (a fresh advance with a collapsed window is not a
                        # better artifact than a mastered shorter distance)
                        td = rec.get("target_dist", 0.0)
                        score = (td if float(win) >= 0.7 else 0.0, float(win))
                        if score > self._best_score:
                            self._best_score = score
                            self._best_train_state = self._copy_state(
                                self.train_state)
                            self._best_it = it
                            self._best_target_dist = td
                            self._best_dirty = True
                if verbose:
                    print(f"it {it:5d} | fps {fps:9.0f} | rew {rec.get('rew_total', 0):8.3f} | "
                          f"eplen {rec['episode_length_mean']:7.1f} | "
                          f"reached {rec['reached_mean']:.3f} | "
                          f"vloss {rec['value_loss']:.4f} | lr {rec['learning_rate']:.2e}")
                if self.log_wandb:
                    import wandb
                    wandb.log(rec, step=it)
                if self.logdir:
                    with open(os.path.join(self.logdir, "metrics.jsonl"), "a") as f:
                        f.write(json.dumps(rec) + "\n")

            if (self.logdir and update_model
                    and (it % self.runner_args.save_interval == 0) and it > 0):
                self.save(os.path.join(self.logdir, f"ac_weights_{it:06d}.pkl"))
                self.save(os.path.join(self.logdir, "ac_weights_last.pkl"))
                # persist the in-memory best snapshot captured in the log
                # block above (the saved train_state is the SNAPSHOT, which
                # may be older than the current one)
                if self._best_dirty and self._best_train_state is not None:
                    self._best_dirty = False
                    self.save(os.path.join(self.logdir, "ac_weights_best.pkl"),
                              train_state=self._best_train_state,
                              target_dist=self._best_target_dist)
                    with open(os.path.join(self.logdir, "best.json"), "w") as f:
                        json.dump({"it": self._best_it,
                                   "target_dist": self._best_score[0],
                                   "window_reached": self._best_score[1],
                                   "restores": self._restore_count}, f)

        if self.logdir:
            self.save(os.path.join(self.logdir, "ac_weights_last.pkl"))
            # deployment export (policy.npz — numpy runtime on the robot)
            from ..io.checkpoint import export_policy_npz
            export_policy_npz(os.path.join(self.logdir, "policy.npz"),
                              jax.tree.map(np.asarray, self.train_state.params))
        return self.history

    # ---------------------------------------------------------------- video
    def _write_training_video(self, it: int):
        """Render the buffered env0 kinematic frames to mp4 (training-time
        video parity with reference ppo_cse/__init__.py:322-345)."""
        from ..io.render import render_frames, write_mp4
        buf = jax.tree.map(np.asarray, self._video_buf)
        frames = []
        for chunk in buf:
            T = chunk["base_pos"].shape[0]
            for t in range(T):
                frames.append({
                    "base_pos": chunk["base_pos"][None, t],
                    "base_quat": chunk["base_quat"][None, t],
                    "qj": chunk["qj"][None, t],
                })
        frames = frames[-self.runner_args.video_frames:]
        if not frames:
            return
        terrain = getattr(self.env, "terrain", None)
        if terrain is None or getattr(terrain, "tiles", None) is None:
            return
        outdir = os.path.join(self.logdir, "videos")
        os.makedirs(outdir, exist_ok=True)
        tile = int(np.asarray(terrain.env_tile)[0])
        try:
            path = write_mp4(render_frames(frames, terrain, tile_idx=tile),
                             os.path.join(outdir, f"train_it{it:06d}.mp4"))
            if self.log_wandb:
                import wandb
                wandb.log({"train_video": wandb.Video(path)}, step=it)
        except Exception as e:  # rendering must never kill a training run
            print(f"training-video render failed at it {it}: {e}")

    # --------------------------------------------------------------- export
    def get_inference_policy(self):
        params = self.train_state.params
        return jax.jit(lambda obs, obs_history: self.alg.act_inference(
            params, obs, obs_history))
