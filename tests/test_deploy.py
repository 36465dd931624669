"""Deployment stack tests: LCM-lite codec/transport, C++ bridge interop,
policy runtime vs jax policy equivalence."""

import os
import socket
import subprocess
import time

import numpy as np
import pytest

from legged_tracking_tpu.deploy.lcm_lite import LCMLite
from legged_tracking_tpu.deploy.lcm_types import (leg_control_data_lcmt,
                                                  pd_tau_targets_lcmt,
                                                  rc_command_lcmt,
                                                  state_estimator_lcmt)

BRIDGE_DIR = os.path.join(os.path.dirname(__file__), "..",
                          "legged_tracking_tpu", "deploy", "bridge")


def test_lcm_roundtrip():
    msg = pd_tau_targets_lcmt()
    msg.q_des = list(np.arange(12) * 0.1)
    msg.kp = [20.0] * 12
    msg.timestamp_us = 123456789
    data = msg.encode()
    out = pd_tau_targets_lcmt.decode(data)
    assert np.allclose(out.q_des, msg.q_des)
    assert out.timestamp_us == 123456789
    for cls in (leg_control_data_lcmt, state_estimator_lcmt, rc_command_lcmt):
        m = cls()
        assert cls.decode(m.encode()) is not None


def _multicast_available():
    try:
        lc = LCMLite(port=7668)
        lc.publish("ping", b"x")
        ok = lc.handle_once(timeout=0.5) or True
        lc.close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _multicast_available(), reason="no multicast loopback")
def test_lcm_pubsub_loopback():
    lc = LCMLite(port=7669)
    got = {}
    lc.subscribe("leg_control_data", lambda ch, d: got.update(
        {"msg": leg_control_data_lcmt.decode(d)}))
    msg = leg_control_data_lcmt()
    msg.q = list(np.linspace(-1, 1, 12))
    lc.publish("leg_control_data", msg.encode())
    t0 = time.time()
    while "msg" not in got and time.time() - t0 < 2.0:
        lc.handle_once(0.2)
    lc.close()
    assert "msg" in got
    assert np.allclose(got["msg"].q, msg.q, atol=1e-6)


def _build_bridge():
    build = os.path.join(BRIDGE_DIR, "build")
    os.makedirs(build, exist_ok=True)
    exe = os.path.join(build, "go1_bridge")
    if not os.path.exists(exe):
        subprocess.run(["cmake", ".."], cwd=build, check=True,
                       capture_output=True)
        subprocess.run(["make"], cwd=build, check=True, capture_output=True)
    return exe


@pytest.mark.skipif(not _multicast_available(), reason="no multicast loopback")
def test_cpp_bridge_interop():
    """The C++ bridge and the python LCM-lite must agree on the wire format:
    run the loopback bridge and receive its joint-state telemetry."""
    exe = _build_bridge()
    lc = LCMLite()
    got = {}
    lc.subscribe("leg_control_data", lambda ch, d: got.update(
        {"legs": leg_control_data_lcmt.decode(d)}))
    lc.subscribe("state_estimator_data", lambda ch, d: got.update(
        {"imu": state_estimator_lcmt.decode(d)}))
    proc = subprocess.Popen([exe, "500"], stdout=subprocess.PIPE)
    try:
        t0 = time.time()
        while len(got) < 2 and time.time() - t0 < 5.0:
            lc.handle_once(0.2)
        # send a PD command at the nominal pose; bridge must keep running
        cmd = pd_tau_targets_lcmt()
        cmd.q_des = [-0.1, 0.8, -1.5] * 4
        cmd.kp = [20.0] * 12
        cmd.kd = [0.5] * 12
        lc.publish("pd_plustau_targets", cmd.encode())
    finally:
        proc.wait(timeout=10)
        lc.close()
    assert "legs" in got and "imu" in got
    # loopback stub starts at the nominal pose
    assert abs(got["legs"].q[1] - 0.8) < 0.5
    assert got["imu"].quat[3] == pytest.approx(1.0)


def test_policy_runtime_matches_jax(tmp_path):
    """Numpy deployment runtime must reproduce the jax act_student output."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from legged_tracking_tpu.learn.actor_critic import ActorCriticCSE, ACArgs
    from legged_tracking_tpu.io.checkpoint import export_policy_npz
    from legged_tracking_tpu.deploy.policy_runtime import PolicyRuntime

    ac = ActorCriticCSE(num_obs=41, num_privileged_obs=2, num_obs_history=41,
                        num_actions=12, args=ACArgs())
    params = ac.init(jax.random.key(0), jnp.zeros((1, 41)), jnp.zeros((1, 2)),
                     jnp.zeros((1, 41)))
    path = str(tmp_path / "policy.npz")
    export_policy_npz(path, params)
    rt = PolicyRuntime(path)
    x = np.random.RandomState(0).randn(3, 41).astype(np.float32)
    y_np = rt(x)
    y_jax = np.asarray(ac.apply(params, jnp.asarray(x), jnp.asarray(x),
                                method=ActorCriticCSE.act_student))
    assert np.allclose(y_np, y_jax, atol=1e-4), np.abs(y_np - y_jax).max()


def test_camera_decode():
    """Synthetic 5-camera frames through the estimator's decode callbacks
    (reference cheetah_state_estimator.py:322-377)."""
    from legged_tracking_tpu.deploy.lcm_types import (camera_message_lcmt,
                                                      camera_message_rect_wide)
    from legged_tracking_tpu.deploy.state_estimator import StateEstimator

    class _FakeLC:
        def subscribe(self, ch, cb):
            pass

    se = StateEstimator(_FakeLC(), use_cameras=True)

    # raw fisheye: 3x200x464, deterministic pattern
    raw = np.arange(3 * 200 * 464, dtype=np.uint8)
    msg = camera_message_lcmt(data=raw.tobytes())
    se._camera_cb("camera1", msg.encode())
    img = se.camera_image_front
    assert img.shape == (200, 464, 3)
    chw = raw.reshape(3, 200, 464)
    assert np.array_equal(img, chw.transpose(1, 2, 0))

    # rectified wide: 3x100x116 with the reference's double flip
    raw2 = np.arange(3 * 100 * 116, dtype=np.uint8)
    msg2 = camera_message_rect_wide(data=raw2.tobytes())
    se._rect_camera_cb("rect_image_rear", msg2.encode())
    img2 = se.camera_image_rear
    assert img2.shape == (100, 116, 3)
    expect = np.flip(np.flip(raw2.reshape(3, 100, 116), axis=0),
                     axis=1).transpose(1, 2, 0)
    assert np.array_equal(img2, expect)

    # fingerprint is validated on decode
    with pytest.raises(ValueError):
        camera_message_rect_wide.decode(msg.encode())


def test_velocity_agent_obs():
    """15-dim RC command path (scripts/deploy_policy.py): LCMAgent with the
    velocity-task config must assemble the reference's 70-dim walk-these-ways
    observation and advance the gait clock (reference deploy_policy.py:33,
    lcm_agent get_obs)."""
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.deploy.command_profiles import RCControllerProfile
    from legged_tracking_tpu.deploy.lcm_agent import LCMAgent
    from legged_tracking_tpu.deploy.state_estimator import StateEstimator

    cfg = config_go1(Cfg())
    cfg.env.observe_heights = False
    cfg.terrain.measure_heights = False
    cfg.env.observe_vel = False
    cfg.env.observe_yaw = False
    cfg.env.observe_two_prev_actions = True
    cfg.env.observe_clock_inputs = True
    cfg.env.command_type = "velocity"
    cfg.commands.num_commands = 15
    cfg.parse()

    class _FakeLC:
        def subscribe(self, ch, cb):
            pass

        def publish(self, ch, data):
            pass

    se = StateEstimator(_FakeLC())
    se.left_stick = np.array([0.0, 0.5])      # forward command
    profile = RCControllerProfile(cfg.control.decimation * cfg.sim.dt, se,
                                  x_scale=2.0, y_scale=0.6, yaw_scale=1.0)
    agent = LCMAgent(cfg, se, profile, _FakeLC())
    obs = agent.get_obs()
    assert obs.shape == (1, 70), obs.shape     # reference 70-dim layout
    assert np.isfinite(obs).all()
    # x command scaled by x_scale through the profile
    assert agent.commands[0, 0] == pytest.approx(1.0)
    # gait clock advances between observations
    clock0 = agent.clock_inputs.copy()
    agent.timestep += 1
    agent.get_obs()
    assert not np.allclose(agent.clock_inputs, clock0)


def test_planner_goal_profile():
    """Planner-in-the-loop deploy profile: replans around an obstacle on a
    synthetic scanned elevation map and emits body-frame goal commands."""
    from legged_tracking_tpu.deploy.command_profiles import PlannerGoalProfile

    # 4 m x 2 m map: flat floor, high ceiling, with a wall blocking the
    # centre except a gap at low y
    hs = 0.05
    nx, ny = 80, 40
    emap = np.zeros((2, nx, ny), dtype=np.float32)
    emap[0] = 1.0                       # ceiling opening 1 m everywhere
    emap[1, 38:42, 12:] = 1.0           # wall at x~2m, gap at y<0.6
    emap[0, 38:42, 12:] = 1.0

    class _SE:
        xy = np.array([0.4, 1.0])
        yaw = 0.0

        def get_xy_yaw(self):
            return self.xy.copy(), self.yaw

    se = _SE()
    prof = PlannerGoalProfile(0.02, se, emap, goal_xy=(3.6, 1.0),
                              horizontal_scale=hs, replan_steps=50, seed=3)
    cmd, reset = prof.get_command(0)
    assert prof.path is not None, "planner failed on an open map"
    assert not reset
    # follow the waypoints with a fake robot: command should never point
    # through the wall band when the robot is in front of it
    for step in range(1, 400):
        cmd, _ = prof.get_command(step)
        step_vec = cmd[:2]
        n = np.linalg.norm(step_vec)
        if n > 1e-6:
            se.xy = se.xy + step_vec / n * min(0.05, n)
        if np.linalg.norm(se.xy - np.array([3.6, 1.0])) < 0.2:
            break
    assert np.linalg.norm(se.xy - np.array([3.6, 1.0])) < 0.35, se.xy
    # the traversal must have detoured through the gap (low y) around x=2m
    # (we can't cross the wall): check final position reached implies a path
    # existed that avoids emap[1] high cells
