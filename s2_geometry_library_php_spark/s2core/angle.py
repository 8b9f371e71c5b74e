"""S1Angle and R2Vector value types (S1Angle.php, R2Vector.php).

The engine's hot paths work on raw radian/uv numpy columns; these thin
wrappers exist for public-API parity with the reference's object
surface — construction from radians/degrees/E5/E6/E7, comparisons, and
the 2-vector algebra used by uv-space helpers like
``Cell.get_center_uv``.
"""

from __future__ import annotations

import math


class S1Angle:
    """One-dimensional angle stored in radians (S1Angle.php:5-15)."""

    __slots__ = ("radians",)

    def __init__(self, radians: float = 0.0):
        self.radians = float(radians)

    # --- constructors (S1Angle.php:68-110,152-176) ---
    @staticmethod
    def from_radians(radians: float) -> "S1Angle":
        return S1Angle(radians)

    @staticmethod
    def from_degrees(degrees: float) -> "S1Angle":
        return S1Angle(degrees * (math.pi / 180.0))

    @staticmethod
    def from_e5(e5: float) -> "S1Angle":
        return S1Angle.from_degrees(e5 * 1e-5)

    @staticmethod
    def from_e6(e6: float) -> "S1Angle":
        return S1Angle.from_degrees(e6 * 1e-6)

    @staticmethod
    def from_e7(e7: float) -> "S1Angle":
        return S1Angle.from_degrees(e7 * 1e-7)

    @staticmethod
    def between_points(a, b) -> "S1Angle":
        """Angle between two direction vectors (S1Angle.php:62-66)."""
        from . import geom

        return S1Angle(float(geom.angle_between(a, b)))

    # --- accessors (S1Angle.php:13-59) ---
    def degrees(self) -> float:
        return self.radians * (180.0 / math.pi)

    def e5(self) -> float:
        return round(self.degrees() * 1e5)

    def e6(self) -> float:
        return round(self.degrees() * 1e6)

    def e7(self) -> float:
        return round(self.degrees() * 1e7)

    # --- comparisons (S1Angle.php:112-146, compareTo 181-183) ---
    def __eq__(self, other) -> bool:
        return isinstance(other, S1Angle) and self.radians == other.radians

    def __hash__(self) -> int:
        return hash(self.radians)

    def __lt__(self, other: "S1Angle") -> bool:
        return self.radians < other.radians

    def __le__(self, other: "S1Angle") -> bool:
        return self.radians <= other.radians

    def __gt__(self, other: "S1Angle") -> bool:
        return self.radians > other.radians

    def __ge__(self, other: "S1Angle") -> bool:
        return self.radians >= other.radians

    @staticmethod
    def max(left: "S1Angle", right: "S1Angle") -> "S1Angle":
        return right if right > left else left

    @staticmethod
    def min(left: "S1Angle", right: "S1Angle") -> "S1Angle":
        return left if right > left else right

    def __repr__(self) -> str:
        return f"{self.degrees()}d"


class R2Vector:
    """2-vector over (u, v) face coordinates (R2Vector.php)."""

    __slots__ = ("x", "y")

    def __init__(self, x: float = 0.0, y: float = 0.0):
        self.x = float(x)
        self.y = float(y)

    def get(self, index: int) -> float:
        """Component by index; raises past 1 (R2Vector.php:33-39)."""
        if index > 1 or index < 0:
            raise IndexError(f"index {index} out of bounds for R2Vector")
        return self.x if index == 0 else self.y

    def add(self, other: "R2Vector") -> "R2Vector":
        return R2Vector(self.x + other.x, self.y + other.y)

    def mul(self, m: float) -> "R2Vector":
        return R2Vector(m * self.x, m * self.y)

    def norm2(self) -> float:
        return self.x * self.x + self.y * self.y

    def dot_prod(self, other: "R2Vector") -> float:
        return self.x * other.x + self.y * other.y

    def cross_prod(self, other: "R2Vector") -> float:
        """Scalar z of the embedded 3-space cross (R2Vector.php:74-76)."""
        return self.x * other.y - self.y * other.x

    def less_than(self, other: "R2Vector") -> bool:
        """Lexicographic by (x, y) (R2Vector.php:82-92)."""
        if self.x < other.x:
            return True
        if other.x < self.x:
            return False
        return self.y < other.y

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, R2Vector)
            and self.x == other.x
            and self.y == other.y
        )

    def __hash__(self) -> int:
        return hash((self.x, self.y))

    def __repr__(self) -> str:
        return f"({self.x}, {self.y})"
