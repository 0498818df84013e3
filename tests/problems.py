"""Textbook LP problem bank with known optima (correctness oracle).

Same ground-truth instances the reference tests use (each cited to its
textbook page; reference ``tests/problems.py:18-167``), organized as explicit
registries instead of ``globals()`` name-scraping.
"""

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class LPCase:
    """Standard-form LP with known optimal bfs/basis."""

    name: str
    c: np.ndarray
    A: np.ndarray
    b: np.ndarray
    starting_basis: Optional[np.ndarray]
    optimal_bfs: np.ndarray
    optimal_basis: Optional[np.ndarray]


@dataclasses.dataclass(frozen=True)
class BlandPathCase:
    """Standard-form LP with the published Bland's-rule basis sequence."""

    name: str
    c: np.ndarray
    A: np.ndarray
    b: np.ndarray
    basis_seq: np.ndarray


def _arr(x):
    return np.asarray(x, dtype=np.float64)


# Papadimitriou & Steiglitz, Combinatorial Optimization, pg. 57
PAPADIMITRIOU_PG57 = LPCase(
    name="papadimitriou_pg57",
    c=_arr([1, 1, 1, 0, 0, 0, 0, 0]),
    A=_arr(
        [
            [1, 0, 0, 3, 2, 1, 0, 0],
            [0, 1, 0, 5, 1, 1, 1, 0],
            [0, 0, 1, 2, 5, 1, 0, 1],
        ]
    ),
    b=_arr([1, 3, 4]),
    starting_basis=np.array([0, 1, 2]),
    optimal_bfs=_arr([0.5, 2.5, 1.5]),
    optimal_basis=np.array([4, 6, 7]),
)

# Luenberger & Ye, Linear and Nonlinear Programming 3rd ed., pg. 48
LUENBERGER_PG48 = LPCase(
    name="luenberger_pg48",
    c=-1 * _arr([3, 1, 3, 0, 0, 0]),
    A=_arr(
        [
            [2, 1, 1, 1, 0, 0],
            [1, 2, 3, 0, 1, 0],
            [2, 2, 1, 0, 0, 1],
        ]
    ),
    b=_arr([2, 5, 6]),
    starting_basis=np.array([3, 4, 5]),
    optimal_bfs=_arr([0.2, 1.6, 4.0]),
    optimal_basis=np.array([0, 2, 5]),
)

# Bazaraa, Linear Programming and Network Flows 2nd ed., pg. 110
BAZARAA_PG110 = LPCase(
    name="bazaraa_pg110",
    c=_arr([-1, -3, 0, 0]),
    A=_arr([[2, 3, 1, 0], [-1, 1, 0, 1]]),
    b=_arr([6, 1]),
    starting_basis=np.array([2, 3]),
    optimal_bfs=_arr([0.6, 1.6]),
    optimal_basis=np.array([0, 1]),
)

# Bazaraa, Linear Programming and Network Flows 2nd ed., pg. 117
BAZARAA_PG117 = LPCase(
    name="bazaraa_pg117",
    c=_arr([1, 1, -4, 0, 0, 0]),
    A=_arr(
        [
            [1, 1, 2, 1, 0, 0],
            [1, 1, -1, 0, 1, 0],
            [-1, 1, 1, 0, 0, 1],
        ]
    ),
    b=_arr([9, 2, 4]),
    starting_basis=np.array([3, 4, 5]),
    optimal_bfs=_arr([1 / 3, 6, 13 / 3]),
    optimal_basis=np.array([0, 4, 2]),
)

# Bertsimas & Tsitsiklis, Introduction to Linear Optimization, pg. 162
BERTSIMAS_PG162_DUAL = LPCase(
    name="bertsimas_pg162_dual",
    c=_arr([1, 1, 0, 0]),
    A=_arr([[-1, -2, 1, 0], [-1, 0, 0, 1]]),
    b=_arr([-2, -1]),
    starting_basis=np.array([2, 3]),
    optimal_bfs=_arr([0.5, 1.0]),
    optimal_basis=np.array([1, 0]),
)

# Luenberger & Ye, Linear and Nonlinear Programming, pg. 93
LUENBERGER_PG93_DUAL = LPCase(
    name="luenberger_pg93_dual",
    c=_arr([3, 4, 5, 0, 0]),
    A=_arr([[-1, -2, -3, 1, 0], [-2, -2, -1, 0, 1]]),
    b=_arr([-5, -6]),
    starting_basis=np.array([3, 4]),
    optimal_bfs=_arr([1.0, 2.0]),
    optimal_basis=np.array([0, 1]),
)

BLAND_PATH_PAPADIMITRIOU = BlandPathCase(
    name="bland_path_papadimitriou",
    c=PAPADIMITRIOU_PG57.c,
    A=PAPADIMITRIOU_PG57.A,
    b=PAPADIMITRIOU_PG57.b,
    basis_seq=np.array(
        [
            [0, 1, 2],  # start
            [3, 1, 2],
            [4, 1, 2],
            [4, 6, 2],
            [4, 6, 7],
        ]
    ),
)

# Bazaraa, ex. 6.8 pg. 272
BAZARAA_PG272_PRIMAL_DUAL = LPCase(
    name="bazaraa_pg272_primal_dual",
    c=_arr([3, 4, 6, 7, 5, 0, 0]),
    A=_arr([[2, -1, 1, 6, -5, -1, 0], [1, 1, 2, 1, 2, 0, -1]]),
    b=_arr([6, 3]),
    starting_basis=None,
    optimal_bfs=_arr([3, 0, 0, 0, 0, 0, 0]),
    optimal_basis=None,
)

# Luenberger & Ye, pg. 96
LUENBERGER_PG96_PRIMAL_DUAL = LPCase(
    name="luenberger_pg96_primal_dual",
    c=_arr([2, 1, 4]),
    A=_arr([[1, 1, 2], [2, 1, 3]]),
    b=_arr([3, 5]),
    starting_basis=None,
    optimal_bfs=_arr([2, 1, 0]),
    optimal_basis=None,
)

# negative-cost instance: exercises the primal-dual bounding-row expansion
NEGATIVE_COST_PRIMAL_DUAL = LPCase(
    name="negative_cost_primal_dual",
    c=_arr([-2, 1, -1, 0, 0]),
    A=_arr([[1, 1, 1, 1, 0], [-1, 2, 0, 0, 1]]),
    b=_arr([6, 4]),
    starting_basis=None,
    optimal_bfs=_arr([6.0, 0.0, 0.0, 0.0, 10.0]),
    optimal_basis=None,
)

PRIMAL_PROBLEMS = [
    PAPADIMITRIOU_PG57,
    LUENBERGER_PG48,
    BAZARAA_PG110,
    BAZARAA_PG117,
]
DUAL_PROBLEMS = [BERTSIMAS_PG162_DUAL, LUENBERGER_PG93_DUAL]
BLAND_PATH_PROBLEMS = [BLAND_PATH_PAPADIMITRIOU]
PRIMAL_DUAL_PROBLEMS = [
    BAZARAA_PG272_PRIMAL_DUAL,
    LUENBERGER_PG96_PRIMAL_DUAL,
    NEGATIVE_COST_PRIMAL_DUAL,
]
