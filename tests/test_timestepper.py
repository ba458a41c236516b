"""Timestepper state-machine unit tests with manufactured ODEs.

Mirrors the reference's timestepper unit tests
(test/unit/src/timestepper_test.F90:19-120): exact linear-decay
solutions for BE and variable-step BDF2 (through the production
method_coeffs), the retry ladder (dt x 0.2 on nonconvergence, abort at
max tries), fixed-size sequences with fall-over to adaptive stepping,
checkpoints at exact output times with repeat, and stop criteria.
"""

from types import SimpleNamespace

import numpy as np
import jax.numpy as jnp
import pytest

from waiwera_tpu.sim.timestepper import Timestepper
from waiwera_tpu.solver.newton import NewtonResult
from waiwera_tpu.solver.system import method_coeffs


class DecaySim:
    """Manufactured ODE d/dt y = -lam*y (L = y, R = -lam*y): the
    implicit update solves c_lhs*y + const + dt_eff*lam*y = 0 exactly,
    so timestepper output can be checked against the method's exact
    discrete solution and the analytic exp(-lam t)."""

    def __init__(self, lam=1.0, y0=1.0, fail_if_dt_above=None,
                 iterations=3):
        self.lam = lam
        self.y0 = jnp.asarray([[float(y0)]])
        self.region0 = jnp.asarray([1])
        self.mesh_dev = SimpleNamespace(is_ghost=jnp.asarray([False]))
        self.sources = None
        self.tracers = None
        self.config = {}
        self.fail_if_dt_above = fail_if_dt_above
        self.iterations = iterations
        self.tried_dts = []

    def lhs_at(self, y, region):
        fluid = SimpleNamespace(temperature=jnp.zeros(1))
        return y, fluid, jnp.asarray([False])

    def make_step_fn(self, params, method="beuler"):
        def step(y, region, temperature, lhs_last, lhs_last2, t_last,
                 dt, dt_last, first):
            self.tried_dts.append(float(dt))
            coeffs = method_coeffs(
                method, dt, dt_last, first, lhs_last, lhs_last2
            )
            ynew = -coeffs.const / (
                coeffs.c_lhs + coeffs.dt_eff * self.lam
            )
            conv = not (
                self.fail_if_dt_above is not None
                and float(dt) > self.fail_if_dt_above
            )
            res = NewtonResult(
                y=ynew,
                region=region,
                iterations=jnp.asarray(self.iterations, jnp.int32),
                converged=jnp.asarray(conv),
                failed=jnp.asarray(False),
                max_residual=jnp.asarray(0.0),
                linear_iterations=jnp.asarray(0, jnp.int32),
                worst_cell=jnp.asarray(0, jnp.int32),
                worst_equation=jnp.asarray(0, jnp.int32),
            )
            fluid = SimpleNamespace(temperature=temperature)
            return res, fluid, ynew, jnp.zeros((1, 1))

        return step


def _config(**step):
    return {"time": {"stop": step.pop("stop", None),
                     "step": step}}


def test_backward_euler_exact_discrete_solution():
    lam, dt, n = 0.7, 0.1, 10
    sim = DecaySim(lam=lam)
    cfg = _config(size=dt, stop=n * dt,
                  maximum={"number": 100})
    ts = Timestepper(cfg, sim)
    assert ts.run()
    y = float(np.asarray(ts.final_y)[0, 0])
    exact = 1.0 / (1.0 + lam * dt) ** n
    np.testing.assert_allclose(y, exact, rtol=1e-12)
    assert ts.taken == n
    np.testing.assert_allclose(ts.final_time, n * dt, rtol=1e-12)


def test_bdf2_second_order_convergence():
    """BDF2 error on dy/dt=-y over [0,1] shrinks ~4x when dt halves
    (BE only shrinks ~2x)."""
    lam, T = 1.0, 1.0
    errs = {}
    for dt in (0.05, 0.025):
        sim = DecaySim(lam=lam)
        cfg = _config(size=dt, stop=T, method="bdf2",
                      maximum={"number": 1000})
        ts = Timestepper(cfg, sim)
        assert ts.run()
        y = float(np.asarray(ts.final_y)[0, 0])
        errs[dt] = abs(y - np.exp(-lam * T))
    ratio = errs[0.05] / errs[0.025]
    assert 3.3 < ratio < 4.7, (errs, ratio)


def test_retry_ladder_reduces_stepsize():
    """Nonconvergence retries the step at dt x 0.2
    (timestepper.F90:1360-1376)."""
    sim = DecaySim(fail_if_dt_above=0.05)
    cfg = _config(size=0.5, stop=1.0, maximum={"number": 5})
    ts = Timestepper(cfg, sim)
    assert ts.run()
    # first try at 0.5 failed; retried at 0.1 (x0.2), failed; at 0.02 ok
    np.testing.assert_allclose(sim.tried_dts[:3], [0.5, 0.1, 0.02])
    assert ts.taken >= 1


def test_retry_ladder_aborts_after_max_tries():
    sim = DecaySim(fail_if_dt_above=0.0)  # never converges
    cfg = _config(size=1.0, stop=10.0,
                  maximum={"number": 5, "tries": 4})
    ts = Timestepper(cfg, sim)
    ok = ts.run()
    assert not ok and ts.aborted
    assert len(sim.tried_dts) == 4
    np.testing.assert_allclose(
        sim.tried_dts, [1.0, 0.2, 0.04, 0.008]
    )


def test_fixed_sequence_then_fall_over_to_adaptive():
    """A step-size list is honoured in order, then falls over to the
    adaptive monitor (timestepper.F90:1381-1453)."""
    sim = DecaySim(iterations=2)  # below adapt minimum -> amplify
    sizes = [0.1, 0.2, 0.3]
    cfg = _config(size=sizes, stop=10.0,
                  adapt={"on": True, "minimum": 5, "maximum": 8,
                         "amplification": 2.0},
                  maximum={"number": 6})
    ts = Timestepper(cfg, sim)
    assert ts.run()
    # the first three steps use the fixed sequence
    np.testing.assert_allclose(sim.tried_dts[:3], sizes)
    # after the sequence: adaptive, iterations=2 < min 5 -> dt doubles
    np.testing.assert_allclose(sim.tried_dts[3], 0.6)
    np.testing.assert_allclose(sim.tried_dts[4], 1.2)


def test_adaptive_reduction_when_iterations_high():
    """TOO_BIG rejects the try and retries at dt x reduction
    (timestepper.F90:1457-1476: adapt -> accepted=FALSE, reduce)."""
    sim = DecaySim(iterations=9)  # above adapt maximum -> reduce

    # iteration count falls once the step is small enough
    base_step = sim.make_step_fn

    def make_step_fn(params, method="beuler"):
        inner = base_step(params, method)

        def step(*args):
            dt = float(args[6])
            sim.iterations = 9 if dt > 0.05 else 6
            return inner(*args)

        return step

    sim.make_step_fn = make_step_fn
    cfg = _config(size=0.1, stop=1.0,
                  adapt={"on": True, "minimum": 5, "maximum": 8,
                         "reduction": 0.2},
                  maximum={"number": 3})
    ts = Timestepper(cfg, sim)
    assert ts.run()
    # first try at 0.1 rejected (9 iterations > max 8), retried at 0.02
    assert sim.tried_dts[0] == pytest.approx(0.1)
    assert sim.tried_dts[1] == pytest.approx(0.02)
    # the rejected try must not advance time
    assert ts.final_time <= 1.0


def test_checkpoints_hit_exact_times_and_restore():
    """Output checkpoints clip dt to land exactly, then restore the
    pre-checkpoint step size (timestepper.F90:863-968)."""
    sim = DecaySim()
    cfg = {
        "time": {"stop": 1.0, "step": {"size": 0.15,
                                       "maximum": {"number": 50}}},
        "output": {"checkpoint": {"time": [0.2, 0.5]},
                   "initial": False, "final": False},
    }
    ts = Timestepper(cfg, sim)
    assert ts.run()
    times = np.cumsum(sim.tried_dts)
    # both checkpoint times are hit exactly by some accepted step end
    assert np.any(np.isclose(times, 0.2))
    assert np.any(np.isclose(times, 0.5))
    # after the 0.2 checkpoint the step size restores to 0.15
    i = int(np.argmin(np.abs(times - 0.2)))
    assert sim.tried_dts[i + 1] == pytest.approx(0.15)


def test_checkpoint_repeat_cycles():
    sim = DecaySim()
    cfg = {
        "time": {"stop": 2.0, "step": {"size": 0.3,
                                       "maximum": {"number": 50}}},
        "output": {"checkpoint": {"time": [0.4, 0.8], "repeat": 2},
                   "initial": False, "final": False},
    }
    ts = Timestepper(cfg, sim)
    assert ts.run()
    times = np.cumsum(sim.tried_dts)
    # second repeat cycle shifts by the last checkpoint time (0.8):
    # hits at 0.4, 0.8, 1.2, 1.6
    for t_chk in (0.4, 0.8, 1.2, 1.6):
        assert np.any(np.isclose(times, t_chk)), (t_chk, times)


def test_stop_time_exact_landing():
    sim = DecaySim()
    cfg = _config(size=0.4, stop=1.0, maximum={"number": 50})
    ts = Timestepper(cfg, sim)
    assert ts.run()
    np.testing.assert_allclose(ts.final_time, 1.0, rtol=1e-12)
    # the final step was clipped to land on the stop time
    np.testing.assert_allclose(sum(sim.tried_dts), 1.0, rtol=1e-12)


def test_direct_steady_state_single_step():
    """directss solves R(y)=0 in one 'step' (timestepper.F90:33,
    TS_DIRECTSS): for decay the steady state is y=0."""
    sim = DecaySim()
    cfg = {"time": {"step": {"method": "directss", "size": 0.0}}}
    ts = Timestepper(cfg, sim)
    assert ts.run()
    assert ts.taken == 1
    np.testing.assert_allclose(np.asarray(ts.final_y), 0.0, atol=1e-14)
