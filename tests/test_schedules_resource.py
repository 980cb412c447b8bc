"""Tests for temperature schedules and resource losses / gate statistics."""

import jax.numpy as jnp
import numpy as np

from dynmm_tpu.core import ExpDecayTemp, linear_temp, expected_cost_loss, budget_hinge, GateStats


class TestExpDecayTemp:
    def test_endpoints(self):
        sched = ExpDecayTemp(start_t=1.0, end_t=0.001, time_len=500)
        assert sched(0) == 1.0
        np.testing.assert_allclose(sched(500), 0.001, rtol=1e-9)

    def test_monotone_decay(self):
        sched = ExpDecayTemp(1.0, 0.001, 100)
        ts = [sched(e) for e in range(101)]
        assert all(a > b for a, b in zip(ts, ts[1:]))

    def test_zero_time_len_is_constant(self):
        sched = ExpDecayTemp(0.7, 0.001, 0)
        assert sched(0) == sched(50) == 0.7

    def test_reference_config(self):
        # README.md:83-89 best config: temp 1.0 -> 0.001 over 500 epochs.
        sched = ExpDecayTemp(1.0, 0.001, 500)
        # halfway point = geometric mean sqrt(1.0 * 0.001)
        np.testing.assert_allclose(sched(250), np.sqrt(0.001), rtol=1e-6)


class TestLinearTemp:
    def test_clamps(self):
        assert linear_temp(10, 5, 20, 1.0, 0.1) == 1.0
        assert linear_temp(10, 25, 20, 1.0, 0.1) == 0.1
        np.testing.assert_allclose(linear_temp(0, 5, 10, 1.0, 0.0), 0.5)


class TestResourceLoss:
    def test_expected_cost_uses_path_mean(self):
        """Reference normalizes by the path mean: (w.mean(0) * c).mean()."""
        w = jnp.array([[1.0, 0.0], [0.0, 1.0]])  # mean = [0.5, 0.5]
        c = jnp.array([2.0, 10.0])
        np.testing.assert_allclose(
            float(expected_cost_loss(w, c)), (0.5 * 2 + 0.5 * 10) / 2
        )

    def test_budget_hinge(self):
        assert float(budget_hinge(jnp.asarray(5.0), 3.0)) == 2.0
        assert float(budget_hinge(jnp.asarray(2.0), 3.0)) == 0.0


class TestGateStats:
    def test_accumulation_and_ratios(self):
        stats = GateStats()
        stats.append(np.array([[1.0, 0.0], [0.0, 1.0]]))
        stats.append(np.array([[0.0, 1.0], [0.0, 1.0]]))
        np.testing.assert_allclose(stats.branch_ratios(), [0.25, 0.75])
        np.testing.assert_allclose(stats.selection_counts(), [1.0, 3.0])

    def test_expected_flops_matches_reference_formula(self):
        # imdb_dyn.py:66,83-87 — flop table [1.25261, 10.86908] M MACs.
        stats = GateStats()
        stats.append(np.array([[1.0, 0.0]] * 3 + [[0.0, 1.0]]))
        table = [1.25261, 10.86908]
        expected = 0.75 * table[0] + 0.25 * table[1]
        np.testing.assert_allclose(stats.expected_flops(table), expected, rtol=1e-12)

    def test_selection_flops(self):
        stats = GateStats()
        # soft weights (no exact 1s) → zero selections → 0.0
        stats.append(np.array([[0.6, 0.4]]))
        assert stats.selection_flops([1.0, 2.0]) == 0.0
        stats.reset()
        stats.append(np.array([[1.0, 0.0], [0.0, 1.0]]))
        np.testing.assert_allclose(stats.selection_flops([1.0, 3.0]), 2.0)

    def test_reset(self):
        stats = GateStats()
        stats.append(np.ones((2, 2)))
        stats.reset()
        assert stats.weights.size == 0
