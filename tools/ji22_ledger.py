"""Per-term negative-reward ledger for the ji22 shaping bottleneck.

Quantifies, on the AS-PUBLISHED velocity recipe
(/root/reference/scripts/train_velocity_tracking.py:149-152, sigma_rew_neg
0.02), which reward terms consume the ji22 budget for (a) a calm stance and
(b) an untrained random policy, and how much the contact-report texture
contributes — the VERDICT r3 hypothesis that penalty-spring force spikes are
what the shaped-force gait reward punishes. Sweeps SimCfg.contact_report_ema.

Usage: python tools/ji22_ledger.py   (CPU, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def make_env(ema: float, num_envs: int = 16):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from train_velocity_tracking import build_cfg, parse_args
    args = parse_args(["--cpu", "--num_envs", str(num_envs), "--terrain",
                       "plane", "--sigma_rew_neg", "0.02"])
    cfg = build_cfg(args)
    cfg.sim.contact_report_ema = ema
    cfg.noise.add_noise = False
    cfg.domain_rand.push_robots = False
    cfg.domain_rand.randomize_friction = False
    from legged_tracking_tpu.envs.velocity_env import VelocityTrackingEnv
    return VelocityTrackingEnv(cfg)


def ledger(env, policy: str, steps: int = 100, seed: int = 0):
    """Returns (per-term per-step means dict, mean ji22 factor)."""
    key = jax.random.key(seed)
    state = env._reset_jit(jax.random.key(1), False)
    step = jax.jit(env.step_fn)
    sums0 = np.zeros(len(env.metric_names))
    factors = []
    warm = 30 if policy == "stand" else 10     # settle before measuring
    prev_sums = None
    for t in range(steps + warm):
        key, k = jax.random.split(key)
        if policy == "stand":
            a = jnp.zeros((env.num_envs, 12))
        else:
            a = jax.random.normal(k, (env.num_envs, 12))
        state, out = step(state, a)
        if t == warm - 1:
            prev_sums = np.asarray(state.episode_sums)
    sums = np.asarray(state.episode_sums) - prev_sums
    per_step = {n: float(sums[:, i].mean()) / steps
                for i, n in enumerate(env.metric_names)}
    neg = per_step.get("total_neg", 0.0)
    return per_step, neg


def main():
    print(f"{'term':35s} {'stand':>10s} {'random':>10s}   (per step, "
          "published scales, sigma_rew_neg=0.02)")
    tables = {}
    for ema in (0.0, 0.5, 0.8):
        env = make_env(ema)
        stand, _ = ledger(env, "stand")
        rand, _ = ledger(env, "random")
        tables[ema] = (stand, rand)
        if ema == 0.0:
            names = sorted(stand, key=lambda n: stand[n])
            for n in names:
                print(f"{n:35s} {stand[n]:10.4f} {rand[n]:10.4f}")
        s_neg = stand.get("total_neg", 0.0)
        r_neg = rand.get("total_neg", 0.0)
        print(f"\nema={ema}: stance neg/step {s_neg:.4f} "
              f"(ji22 factor {np.exp(s_neg / 0.02):.3g}) | "
              f"random neg/step {r_neg:.4f} "
              f"(factor {np.exp(r_neg / 0.02):.3g})")
        for gait_term in ("tracking_contacts_shaped_force",
                          "tracking_contacts_shaped_vel", "collision",
                          "feet_slip", "raibert_heuristic",
                          "orientation_control", "action_smoothness_1",
                          "action_smoothness_2", "dof_acc", "jump"):
            if gait_term in stand:
                print(f"    {gait_term:35s} stand {stand[gait_term]:8.4f}  "
                      f"random {rand[gait_term]:8.4f}")
    print("\n(ema sweep shows how much of the negative ledger is "
          "contact-report texture vs posture/action terms)")


if __name__ == "__main__":
    main()
