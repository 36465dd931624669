"""PhysX-calibration harness (VERDICT r1 weak #2).

The reference's contact behavior comes from the closed-source PhysX binary
(sim params legged_robot_trajectory_tracking_config.py:354-373); these tests
pin this engine to the Isaac-expected anchors that the round-1 review asked
for — per-body contact STATE at nominal stance, PD step responses, and the
ji22 reward gate at calm stance (whose round-1 annihilation at
sigma_rew_neg=0.02 was traced to spurious calf collision contacts plus the
raibert sign bug, docs/TRAINING_NOTES.md):

- calm PD stance settles with FEET-ONLY contact: every non-foot report slot
  (base/hips/thighs/calves) carries ~zero force, each foot ~weight/4;
- the PD drive (kp 20 / kd 0.5, the reference's stiffness/damping) answers a
  position step like a clean underdamped second-order system — no residual
  oscillation, no instability-scale overshoot;
- at calm stance with zero velocity commands the velocity task's negative
  reward sum stays in the regime measured after the round-2 contact fixes
  (≈ −0.08/step, vs −0.25/step in round 1), so `pos·exp(neg/0.02)` passes
  nonzero signal.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from test_physics import _make_step, DEFAULT_Q

from legged_tracking_tpu.physics.go1_model_data import FOOT_REPORT_SLOTS

MG = 11.309932 * 9.81   # Go1 total weight (URDF masses, N)


def _settle(step, state, carry, params, terr, steps):
    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def run(state, carry, params, n):
        def body(c, _):
            s, cr = c
            s, cr, aux = step(s, cr, params, terr.env_tile,
                              terr.env_terrain_origin)
            return (s, cr), aux.contact_report
        (s, cr), reports = jax.lax.scan(body, (state, carry), None, length=n)
        return s, cr, reports

    return run(state, carry, params, steps)


def test_stance_feet_only_contact():
    """Nominal stance: all contact force lives in the 4 foot slots."""
    N = 4
    terr, params, step, state, carry = _make_step(N, "P")
    s, cr, reports = _settle(step, state, carry, params, terr, 200)

    rep = np.asarray(reports[-1])               # (N, 17, 3)
    foot = rep[:, FOOT_REPORT_SLOTS, :]
    nonfoot = np.delete(rep, FOOT_REPORT_SLOTS, axis=1)
    # Isaac at nominal stance reports feet-only contact; round 1's calf
    # contacts here annihilated the ji22 velocity reward.
    assert np.abs(nonfoot).max() < 1.0, np.abs(nonfoot).max()
    # per-foot share of weight: 4-legged stance, front/rear asymmetry allowed
    fz = foot[:, :, 2]
    assert (fz > 0.14 * MG).all() and (fz < 0.36 * MG).all(), fz / MG
    np.testing.assert_allclose(fz.sum(axis=1), MG, rtol=0.02)
    # base height anchor (kp 20): docs/TRAINING_NOTES.md "z ~ 0.266"
    h = np.asarray(s.base_pos[:, 2])
    assert (h > 0.24).all() and (h < 0.30).all(), h


def test_pd_step_response():
    """Zero-gravity thigh step: clean underdamped 2nd-order response.

    kp 20 / kd 0.5 (reference config :354-357) on the leg inertia gives a
    rise inside ~0.2 s, bounded overshoot, and convergence to the commanded
    offset with zero steady-state error (no gravity load).
    """
    N = 2
    terr, params, step, state, carry = _make_step(N, "P")
    params = params._replace(gravity=jnp.zeros((N, 3)))
    state = state._replace(base_pos=state.base_pos.at[:, 2].set(1.0))
    delta = 0.3
    thigh = [1, 4, 7, 10]
    act = jnp.zeros((N, 12)).at[:, jnp.array(thigh)].set(delta)
    carry = carry[:5] + (act,)

    @jax.jit
    def run(state, carry):
        def body(c, _):
            s, cr = c
            s, cr, aux = step(s, cr, params, terr.env_tile,
                              terr.env_terrain_origin)
            return (s, cr), s.qj
        (s, cr), qs = jax.lax.scan(body, (state, carry), None, length=50)
        return qs                                  # (50, N, 12) @ 20 ms

    qs = np.asarray(run(state, carry))
    x = (qs[:, :, thigh] - np.asarray(DEFAULT_Q)[thigh]) / delta  # normalized
    assert np.isfinite(x).all()
    # rise: 90% of the step within 0.3 s (15 control steps)
    assert x[:15].max(axis=0).min() > 0.9, x[:15].max(axis=0)
    # overshoot bounded (zeta ~ 0.5 -> ~20%; >60% would mean near-unstable)
    assert x.max() < 1.6, x.max()
    # settled by 1 s: within 5% of target, residual oscillation < 5%
    assert np.abs(x[-5:] - 1.0).max() < 0.05, x[-5:]


def test_ji22_gate_at_calm_stance():
    """Velocity task, zero commands, zero actions: the negative reward sum
    per step stays shallow enough that exp(neg/0.02) is nonzero — the
    round-2 contact/raibert fixes hold (docs/TRAINING_NOTES.md round-2
    velocity section; round 1 measured −0.25/step => e^-13 annihilation)."""
    import train_velocity_tracking as tv
    args = tv.parse_args(["--num_envs", "4", "--terrain", "plane",
                          "--pd_control", "--cpu"])
    cfg = tv.build_cfg(args)
    cfg.env.episode_length_s = 20.0
    from legged_tracking_tpu.envs.velocity_env import VelocityTrackingEnv
    env = VelocityTrackingEnv(cfg)
    env.reset(randomize_ep_len=False)
    # calm stance: zero velocity commands, gait clock keeps its reset draw
    env.state = env.state._replace(
        commands=env.state.commands.at[:, :3].set(0.0))
    a = jnp.zeros((4, 12))
    neg_prev = None
    neg_steps = []
    for t in range(60):
        od, rew, done, info = env.step(a)
        assert not bool(done.any())
        neg = np.asarray(info["episode_sums"][:, -1])   # rew_neg column
        if neg_prev is not None and t >= 30:            # after settling
            neg_steps.append(neg - neg_prev)
        neg_prev = neg
    per_step = np.stack(neg_steps).mean(axis=0)
    # round-2 regime: ~−0.08/step (gate e^-4); round-1 bug regime was −0.25
    assert (per_step > -0.15).all(), per_step
    # and the contact state backing it: feet-only contact at stance
    rep = np.asarray(env.state.contact_forces)
    nonfoot = np.delete(rep, FOOT_REPORT_SLOTS, axis=1)
    assert np.abs(nonfoot).max() < 1.0, np.abs(nonfoot).max()
