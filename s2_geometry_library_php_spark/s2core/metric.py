"""Cell-level <-> physical size calibration (S2.php:815-886).

Only the quadratic-projection constants that are live in the reference
are required: MIN_WIDTH deriv = sqrt(2)/3 (S2Projections.php:75-81).
AVG_AREA = pi/6 (S2Projections.php:33, documented constant) is used by
the tiling area estimators.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30


def _exp(v: float) -> int:
    """Exponent e with 0.5 <= |v| * 2^-e < 1 (S2.php:40-48);
    equivalently math.frexp(v)[1]."""
    if v == 0:
        return 0
    return math.frexp(v)[1]


class Metric:
    """dim 1 = length, dim 2 = area (S2.php:815-886)."""

    def __init__(self, dim: int, deriv: float):
        self.dim = dim
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        return math.ldexp(self.deriv, self.dim * (1 - level))

    def get_closest_level(self, value: float) -> int:
        return self.get_min_level(math.sqrt(2.0) * value)

    def get_min_level(self, value: float) -> int:
        """Minimum level such that the metric is at most ``value``
        (S2.php:841-856)."""
        if value <= 0:
            return MAX_LEVEL
        exponent = _exp(value / ((1 << self.dim) * self.deriv))
        return max(0, min(MAX_LEVEL, -((exponent - 1) >> (self.dim - 1))))

    def get_max_level(self, value: float) -> int:
        """Maximum level such that the metric is at least ``value``
        (S2.php:863-879)."""
        if value <= 0:
            return MAX_LEVEL
        exponent = _exp((1 << self.dim) * self.deriv / value)
        return max(0, min(MAX_LEVEL, (exponent - 1) >> (self.dim - 1)))


MIN_WIDTH = Metric(1, math.sqrt(2.0) / 3.0)  # S2Projections.php:78
AVG_AREA = Metric(2, math.pi / 6.0)  # S2Projections.php:33
MAX_DIAG = Metric(1, 1.2193272972170106)  # S2Projections.php:128-133 (doc)
AVG_EDGE = Metric(1, 0.72960687319305303)  # S2Projections.php:106-111 (doc)
