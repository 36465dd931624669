"""End-to-end deployment loop against the C++ loopback bridge.

Full on-robot stack without hardware: go1_bridge (C++ 500 Hz loop with the
in-process PD robot stub) <-> LCM wire <-> StateEstimator + LCMAgent +
numpy PolicyRuntime.  Verifies telemetry flows, observations assemble with
the sim layout, and PD targets published by the agent actually move the
bridge's joints.
"""

import os
import subprocess
import time

import numpy as np
import pytest

from legged_tracking_tpu.deploy.lcm_lite import LCMLite

BRIDGE_DIR = os.path.join(os.path.dirname(__file__), "..",
                          "legged_tracking_tpu", "deploy", "bridge")


def _bridge_exe():
    build = os.path.join(BRIDGE_DIR, "build")
    exe = os.path.join(build, "go1_bridge")
    if not os.path.exists(exe):
        os.makedirs(build, exist_ok=True)
        subprocess.run(["cmake", ".."], cwd=build, check=True, capture_output=True)
        subprocess.run(["make"], cwd=build, check=True, capture_output=True)
    return exe


def _multicast_ok():
    try:
        lc = LCMLite(port=7698)
        lc.publish("ping", b"x")
        lc.close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _multicast_ok(), reason="no multicast loopback")
def test_full_deploy_loop():
    from legged_tracking_tpu.config import Cfg, config_go1
    from legged_tracking_tpu.deploy.command_profiles import DummyFrontGoalProfile
    from legged_tracking_tpu.deploy.lcm_agent import LCMAgent
    from legged_tracking_tpu.deploy.state_estimator import StateEstimator

    cfg = config_go1(Cfg())
    cfg.env.command_type = "xy"
    cfg.terrain.measure_front_half = True
    cfg.env.observe_heights = True
    cfg.parse()

    proc = subprocess.Popen([_bridge_exe(), "3000"], stdout=subprocess.PIPE)
    lc = LCMLite()
    se = StateEstimator(lc)
    se.spin()
    try:
        t0 = time.time()
        while not se.received_first_legdata and time.time() - t0 < 5.0:
            time.sleep(0.05)
        assert se.received_first_legdata, "no leg telemetry from the bridge"

        profile = DummyFrontGoalProfile(cfg.control.decimation * cfg.sim.dt)
        agent = LCMAgent(cfg, se, profile, lc)
        obs = agent.get_obs()
        assert obs.shape == (1, 261)        # sim obs layout on hardware
        assert np.isfinite(obs).all()

        # command a deliberately offset pose and watch the stub track it
        q0 = se.get_dof_pos().copy()
        target_action = np.zeros((1, 12))
        target_action[0, 1] = 0.8           # FR thigh: +0.2 rad at scale 0.25
        for _ in range(120):
            agent.step(target_action)
        q1 = se.get_dof_pos()
        moved = q1[1] - q0[1]
        assert moved > 0.05, f"bridge joints did not track PD targets ({moved:.4f})"
    finally:
        se.close()
        proc.wait(timeout=20)
