"""Parameter schedules (reference baselines/common/schedules.py)."""

from __future__ import annotations


class Schedule:
    def value(self, t):
        raise NotImplementedError


class ConstantSchedule(Schedule):
    def __init__(self, value):
        self._v = value

    def value(self, t):
        return self._v


class LinearSchedule(Schedule):
    """Linear interpolation over schedule_timesteps, then final_p
    (used by deepq's epsilon-greedy exploration)."""

    def __init__(self, schedule_timesteps, final_p, initial_p=1.0):
        self.schedule_timesteps = schedule_timesteps
        self.final_p = final_p
        self.initial_p = initial_p

    def value(self, t):
        fraction = min(float(t) / self.schedule_timesteps, 1.0)
        return self.initial_p + fraction * (self.final_p - self.initial_p)


def linear_interpolation(l, r, alpha):
    return l + alpha * (r - l)


class PiecewiseSchedule(Schedule):
    def __init__(self, endpoints, interpolation=linear_interpolation,
                 outside_value=None):
        idxes = [e[0] for e in endpoints]
        assert idxes == sorted(idxes)
        self._interpolation = interpolation
        self._outside_value = outside_value
        self._endpoints = endpoints

    def value(self, t):
        for (l_t, l), (r_t, r) in zip(self._endpoints[:-1],
                                      self._endpoints[1:]):
            if l_t <= t < r_t:
                alpha = float(t - l_t) / (r_t - l_t)
                return self._interpolation(l, r, alpha)
        assert self._outside_value is not None
        return self._outside_value
