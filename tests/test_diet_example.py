"""End-to-end acceptance: the SAS diet LP (reference ``examples/diet.py``).

The reference's verified output is cost 12.081337630748749 with
x = (0, 0.05359876, 0.44949877, 1.86516786, 0.5, 0) -- BASELINE.md requires a
1e-6 *relative* objective match.
"""

import numpy as np
import pytest

from linprog_tpu import SimplexSolver

REFERENCE_COST = 12.081337630748749
REFERENCE_X = np.array([0.0, 0.05359876, 0.44949877, 1.86516786, 0.5, 0.0])


def diet_problem():
    costs = np.array([2.0, 3.5, 8.0, 1.5, 11.0, 1.0])
    protein = np.array([4.0, 8.0, 7.0, 1.3, 8.0, 9.2])
    fat = np.array([1.0, 5.0, 9.0, 0.1, 7.0, 1.0])
    carbs = np.array([15.0, 11.7, 0.4, 22.6, 0.0, 17.0])
    calories = np.array([0.90, 12, 10.6, 9.7, 13, 18])

    G = np.vstack([-calories, protein, -carbs, -fat])
    h = np.array([-30.0, 10.0, -10.0, -8.0])
    lb = np.zeros(6)
    ub = np.full(6, np.inf)
    lb[4] = 0.5  # fish
    ub[1] = 1.0  # milk
    return costs, G, h, lb, ub


def test_diet_cost_matches_reference_to_1e6_relative():
    c, G, h, lb, ub = diet_problem()
    res = SimplexSolver(c=c, G=G, h=h, lb=lb, ub=ub).solve()
    assert res.optimum
    assert abs(res.cost - REFERENCE_COST) / REFERENCE_COST < 1e-6
    assert np.allclose(res.x, REFERENCE_X, atol=1e-4)
