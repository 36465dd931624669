"""Runtime command sources for deployment.

Ports of ``go1_gym_deploy/utils/command_profile.py``: fixed front goals,
on-robot resampled random trajectories (mirroring ``_traj_fn_random_target``),
and RC-joystick velocity commands.
"""

from __future__ import annotations

import numpy as np


class CommandProfile:
    def __init__(self, dt, max_time_s=10.0):
        self.dt = dt
        self.max_timestep = int(max_time_s / dt)
        self.commands = np.zeros(15)

    def get_command(self, t):
        return self.commands, False

    def reset(self, reset_time=None):
        pass


class DummyFrontGoalProfile(CommandProfile):
    """Fixed goal Δx ahead (reference command_profile.py:23-65)."""

    def __init__(self, dt, goal_x: float = 2.6):
        super().__init__(dt)
        self.goal = np.array([goal_x, 0.0])

    def get_command(self, t):
        cmd = np.zeros(15)
        cmd[:2] = self.goal
        return cmd, False


class RandomTrajectoryProfile(CommandProfile):
    """On-robot random 6-DoF waypoints with interpolation, resampled every
    episode — mirrors _traj_fn_random_target (reference :67-150)."""

    def __init__(self, dt, se, x_range=0.5, y_range=0.5, yaw_range=np.pi,
                 traj_length=10, switch_dist=0.3, episode_s=10.0, seed=0):
        super().__init__(dt, episode_s)
        self.se = se
        self.rng = np.random.RandomState(seed)
        self.x_range, self.y_range, self.yaw_range = x_range, y_range, yaw_range
        self.traj_length = traj_length
        self.switch_dist = switch_dist
        self.traj = None
        self.idx = 0
        self._resample()

    def _resample(self):
        n = self.traj_length + 1
        xs = self.rng.uniform(-self.x_range, self.x_range, n)
        ys = self.rng.uniform(-self.y_range, self.y_range, n)
        yaws = self.rng.uniform(-self.yaw_range, self.yaw_range, n)
        xs[0] = ys[0] = yaws[0] = 0.0
        self.traj = np.stack([xs, ys, yaws], axis=1)[1:]
        self.idx = 0

    def get_command(self, t):
        xy, yaw = self.se.get_xy_yaw()
        target = self.traj[self.idx]
        rel = target[:2] - xy
        # rotate into yaw frame
        c, s = np.cos(-yaw), np.sin(-yaw)
        rel_body = np.array([c * rel[0] - s * rel[1], s * rel[0] + c * rel[1]])
        reset = False
        if np.linalg.norm(rel_body) < self.switch_dist:
            self.idx += 1
            if self.idx >= len(self.traj):
                self._resample()
                reset = True
        cmd = np.zeros(15)
        cmd[:2] = rel_body
        return cmd, reset


class RCControllerProfile(CommandProfile):
    """Joystick velocity + gait commands (reference :238-330)."""

    def __init__(self, dt, state_estimator, x_scale=1.0, y_scale=1.0,
                 yaw_scale=1.0):
        super().__init__(dt)
        self.se = state_estimator
        self.x_scale, self.y_scale, self.yaw_scale = x_scale, y_scale, yaw_scale

    def get_command(self, t):
        cmd = self.se.get_command()
        cmd[0] *= self.x_scale
        cmd[1] *= self.y_scale
        cmd[2] *= self.yaw_scale
        return cmd, False


class ConstantAccelerationProfile(CommandProfile):
    def __init__(self, dt, max_speed, accel_time, zero_buf_time=0.0):
        super().__init__(dt)
        self.max_speed = max_speed
        self.accel_timesteps = accel_time / dt
        self.zero_buf_timesteps = zero_buf_time / dt

    def get_command(self, t):
        ts = t / self.dt
        cmd = np.zeros(15)
        if ts > self.zero_buf_timesteps:
            cmd[0] = min((ts - self.zero_buf_timesteps)
                         / self.accel_timesteps, 1.0) * self.max_speed
        return cmd, False
