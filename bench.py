"""Throughput benchmark: env-steps/s of full PPO training at 4096 envs.

Runs on whatever backend jax selects (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the reference's best logged training fps (1093.8 env-steps/s at
4000 envs on one GPU, BASELINE.md).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(num_envs=None, lane_engine=None):
    """The bench configuration (shared with tools/profile_bench.py).

    Returns (env, alg, train_state, env_state, obs_dict)."""
    import jax
    import numpy as np

    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.envs import LeggedEnv
    from legged_tracking_tpu.learn import PPO, PPOArgs

    if num_envs is None:
        num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    cfg = config_go1(Cfg())
    cfg.env.num_envs = num_envs
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.terrain_type = "single_path"
    cfg.terrain.num_rows = 32
    cfg.terrain.num_cols = 32
    cfg.terrain.terrain_length = 4.0
    cfg.terrain.terrain_width = 2.0
    cfg.terrain.terrain_ratio_x = 0.9
    cfg.terrain.terrain_ratio_y = 0.5
    cfg.terrain.ceiling_height = 0.8
    cfg.terrain.start_loc = 0.32
    cfg.env.episode_length_s = 10.0
    cfg.env.command_type = "xy"
    cfg.terrain.measure_front_half = True
    cfg.terrain.measured_points_x = np.linspace(-1, 1, 21)
    cfg.terrain.measured_points_y = np.linspace(-0.5, 0.5, 11)
    cfg.control.control_type = "actuator_net"
    cfg.asset.penalize_contacts_on = ["thigh", "calf", "base"]
    cfg.asset.terminate_after_contacts_on = []
    cfg.rewards.terminal_body_height = 0.0
    cfg.reward_scales.set("exploration_lin", 1.0)
    cfg.reward_scales.set("exploration_yaw", 0.4)
    cfg.commands.traj_function = "fixed_target"
    cfg.commands.traj_length = 1
    cfg.commands.switch_dist = 0.3
    cfg.commands.base_x = 2.6
    # lane-major physics path (physics/lanes.py) is the measured default
    # (round-3 A/B: 304.9k vs 301.2k; fused sampling on top: 313.1k);
    # BENCH_LANE=0 re-runs the env-major A/B
    if lane_engine is None:
        lane_engine = os.environ.get("BENCH_LANE", "1") == "1"
    cfg.sim.lane_engine = lane_engine
    # fused contact sampling A/B knob (heightfield.sample_patch_bilinear_fused)
    cfg.sim.fused_sampling = os.environ.get(
        "BENCH_FUSED", "1" if cfg.sim.fused_sampling else "0") == "1"
    # contact-window width A/B knob (SimCfg.patch_y): 32 = ±0.8 m default,
    # 24/16 cut the sampling contraction + patch traffic
    cfg.sim.patch_y = int(os.environ.get("BENCH_PATCH_Y", cfg.sim.patch_y))
    # contact-window length A/B knob (SimCfg.patch_x): 24 = ±0.6 m default
    # (round-4 A/B; 16 is +3.7% more but clips stretched poses);
    # px is the fused sampler's stage-1 MXU contraction depth
    cfg.sim.patch_x = int(os.environ.get("BENCH_PATCH_X", cfg.sim.patch_x))
    # granule-aligned patch extraction A/B knob
    # (heightfield.extract_patches_batched_granule)
    cfg.sim.granule_gather = os.environ.get(
        "BENCH_GRANULE", "1" if cfg.sim.granule_gather else "0") == "1"
    # whole-tile-LAYER gather A/B knob (extract_patches_batched_layer)
    cfg.sim.layer_gather = os.environ.get(
        "BENCH_LAYER", "1" if cfg.sim.layer_gather else "0") == "1"
    # round-5 interleaved-unit extraction A/B knob (GranuleSampler) —
    # measured negative, default OFF (SimCfg.interleaved_gather docstring)
    cfg.sim.interleaved_gather = os.environ.get(
        "BENCH_INTERLEAVED", "1" if cfg.sim.interleaved_gather else "0") == "1"
    # Pallas fused obs-scan A/B knob (terrain/pallas_scan.py)
    cfg.sim.pallas_scan = os.environ.get(
        "BENCH_PALLAS_SCAN", "1" if cfg.sim.pallas_scan else "0") == "1"
    # pms-strategy A/B knobs: BENCH_PMS=1 turns on the batched 1125-candidate
    # local planner (sampling_based_planning); BENCH_PMS_RESCAN=1 restores
    # the reference's double height-scan per step for comparison
    if os.environ.get("BENCH_PMS", "0") == "1":
        cfg.commands.sampling_based_planning = True
        cfg.commands.planner_rescan = os.environ.get(
            "BENCH_PMS_RESCAN", "0") == "1"
        # BENCH_PMS_DIRECT=1 restores the materialized rotate-and-normalize
        # candidate scoring (vs the default precomputed quadform matmul)
        cfg.commands.planner_quadform = os.environ.get(
            "BENCH_PMS_DIRECT", "0") != "1"

    env = LeggedEnv(cfg)
    # round-5 PPO data-path A/B knobs (both default OFF — see the PPOArgs
    # docstrings for the measured tradeoffs): BENCH_SHUFFLE=1 swaps the
    # sorted permutation for the O(B) bijection, BENCH_WINDOW=1 swaps
    # stored obs-history rows for the windowed re-gather
    args = PPOArgs(
        cheap_shuffle=os.environ.get("BENCH_SHUFFLE", "0") == "1",
        windowed_history=os.environ.get("BENCH_WINDOW", "0") == "1")
    alg = PPO(env, args=args)
    ts = alg.init(jax.random.key(0))
    env_state = env._reset_jit(jax.random.key(1), True)
    obs = env._observe_jit(env_state)
    return env, alg, ts, env_state, obs


def main():
    import jax

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    env, alg, ts, env_state, obs = build(num_envs)

    key = jax.random.key(2)

    # K train iterations per device call: each dispatch over the axon tunnel
    # costs a flat ~60 ms RPC, so per-iteration host loops understate the
    # device rate (learn/runner.py can adopt the same batching via log_freq)
    K = int(os.environ.get("BENCH_ITERS_PER_CALL", 5))

    @partial(jax.jit, donate_argnums=(0,))
    def run_k(ts, env_state, obs, key):
        def body(c, kk):
            ts, env_state, obs = c
            ts, env_state, obs, m = alg.train_iteration(ts, env_state, obs, kk)
            return (ts, env_state, obs), m["value_loss"]
        keys = jax.random.split(key, K)
        (ts, env_state, obs), vl = jax.lax.scan(body, (ts, env_state, obs), keys)
        return ts, env_state, obs, vl

    # warmup/compile (2 calls: the second catches any signature-driven
    # recompile so the timed loop is pure steady state)
    for _ in range(2):
        key, k = jax.random.split(key)
        ts, env_state, obs, vl = run_k(ts, env_state, obs, k)
    jax.block_until_ready(vl)

    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        ts, env_state, obs, vl = run_k(ts, env_state, obs, k)
    jax.block_until_ready(vl)
    dt = time.perf_counter() - t0

    steps = iters * K * num_envs * alg.args.num_steps_per_env
    fps = steps / dt
    baseline = 1093.8
    print(json.dumps({
        "metric": "train_env_steps_per_s",
        "value": round(fps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(fps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
