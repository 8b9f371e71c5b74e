"""General edge-soup loop assembly (S2PolygonBuilder).

The reference ships this class as commented-out Java
(S2PolygonBuilder.php:1-560); the boolean-op pipeline
(:mod:`polygon_ops`) only ever needed the specialized directed
assembly of its own clean clip output, so this module restores the
GENERAL builder: arbitrary edge soups where loops may share edges,
edge directions may be unknown, and duplicate edge pairs must cancel.

Option axes (S2PolygonBuilder.php:57-120):

* ``undirected`` — adding v0→v1 also adds v1→v0; assembly re-runs a
  loop in the reverse direction until it is normalized (encloses
  less than half the sphere).
* ``xor`` — adding an edge that already exists in the OPPOSITE
  direction erases that edge instead (duplicate edge pairs cancel) —
  the "seamless union of abutting polygons" mode: two polygons
  sharing a boundary segment XOR it away and assemble into one
  region.

The four canonical presets are DIRECTED_XOR (default), UNDIRECTED_XOR,
UNDIRECTED_UNION and DIRECTED_UNION.  ``merge_distance`` merges
near-coincident vertices before assembly (moveVertices,
S2PolygonBuilder.php:520-560, the merge-index role of
S2PolygonBuilder.php:661-663); ``validate`` rejects self-crossing
loops into the unused-edge list instead of emitting them.

Assembly itself walks left-most turns (orderedCCW preference,
S2PolygonBuilder.php:432-495) so CCW loops are produced whenever
possible, backtracking over dead ends, which end up in
``unused_edges``.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from . import geom
from .region import LoopRegion, PolygonRegion

FOUR_PI = 4.0 * math.pi


def _left_area(vertices: np.ndarray) -> float:
    """Area of the region to the LEFT of the closed chain, in
    [0, 4π): the signed fan area, wrapped."""
    from .polygon_ops import loop_signed_area

    s = loop_signed_area(vertices)
    return s if s >= 0.0 else s + FOUR_PI


def is_normalized(vertices: np.ndarray) -> bool:
    """Loop encloses at most half the sphere (S2Loop::isNormalized —
    referenced by the builder's undirected re-assembly loop)."""
    return _left_area(vertices) <= 2.0 * math.pi + 1e-10


class PolygonBuilder:
    """Assemble loops/polygons from an edge soup; see module doc."""

    def __init__(
        self,
        undirected: bool = False,
        xor: bool = True,
        validate: bool = False,
        merge_distance: float = 0.0,
    ):
        self.undirected = undirected
        self.xor = xor
        self.validate = validate
        self.merge_distance = float(merge_distance)
        # origin-key -> Counter of destination keys (a multiset so the
        # same edge may be present more than once in union modes)
        self._edges: dict[tuple, Counter] = {}
        self._pts: dict[tuple, np.ndarray] = {}

    # canonical presets (S2PolygonBuilder.php:57-92)
    @classmethod
    def directed_xor(cls, **kw) -> "PolygonBuilder":
        return cls(undirected=False, xor=True, **kw)

    @classmethod
    def undirected_xor(cls, **kw) -> "PolygonBuilder":
        return cls(undirected=True, xor=True, **kw)

    @classmethod
    def undirected_union(cls, **kw) -> "PolygonBuilder":
        return cls(undirected=True, xor=False, **kw)

    @classmethod
    def directed_union(cls, **kw) -> "PolygonBuilder":
        return cls(undirected=False, xor=False, **kw)

    def _key(self, p: np.ndarray) -> tuple:
        k = (float(p[0]), float(p[1]), float(p[2]))
        self._pts.setdefault(k, np.asarray(p, dtype=np.float64))
        return k

    def _insert(self, k0: tuple, k1: tuple) -> None:
        self._edges.setdefault(k0, Counter())[k1] += 1

    def _erase(self, k0: tuple, k1: tuple) -> None:
        vset = self._edges.get(k0)
        if vset is not None:
            vset[k1] -= 1
            if vset[k1] <= 0:
                del vset[k1]
            if not vset:
                del self._edges[k0]
        if self.undirected:
            vset = self._edges.get(k1)
            if vset is not None:
                vset[k0] -= 1
                if vset[k0] <= 0:
                    del vset[k0]
                if not vset:
                    del self._edges[k1]

    def add_edge(self, v0: np.ndarray, v1: np.ndarray) -> None:
        """Add one edge (degenerate v0 == v1 ignored); under ``xor``
        an existing opposite-direction edge is erased instead
        (S2PolygonBuilder.php:196-230)."""
        k0, k1 = self._key(v0), self._key(v1)
        if k0 == k1:
            return
        if self.xor and self._edges.get(k1, Counter()).get(k0, 0) > 0:
            self._erase(k1, k0)
            return
        self._insert(k0, k1)
        if self.undirected:
            self._insert(k1, k0)

    def add_loop(self, vertices: np.ndarray, is_hole: bool = False) -> None:
        """Add a loop's edges; holes are added reversed so shells are
        CCW and holes CW, the directed-edges convention
        (S2PolygonBuilder.php:232-244)."""
        v = vertices[::-1] if is_hole else vertices
        m = len(v)
        for i in range(m):
            self.add_edge(v[i], v[(i + 1) % m])

    def add_polygon(self, poly: PolygonRegion) -> None:
        """Add all loops; odd-depth loops (holes in the engine's
        all-CCW representation) are added reversed
        (S2PolygonBuilder.php:246-252)."""
        from .region import polygon_loop_depths

        depths = (
            polygon_loop_depths(poly.loops)
            if len(poly.loops) > 1
            else [0] * len(poly.loops)
        )
        for lp, d in zip(poly.loops, depths):
            self.add_loop(lp.vertices, is_hole=(d % 2 == 1))

    # -- vertex merging (moveVertices, S2PolygonBuilder.php:520-560) --
    def _merge_vertices(self) -> None:
        if self.merge_distance <= 0.0 or not self._edges:
            return
        keys = set(self._edges)
        for vset in self._edges.values():
            keys.update(vset)
        reps: list[tuple] = []
        merge_map: dict[tuple, tuple] = {}
        r2 = self.merge_distance * self.merge_distance
        for k in sorted(keys):  # deterministic clustering order
            hit = None
            for r in reps:
                d0 = k[0] - r[0]
                d1 = k[1] - r[1]
                d2 = k[2] - r[2]
                if d0 * d0 + d1 * d1 + d2 * d2 <= r2:
                    hit = r
                    break
            if hit is None:
                reps.append(k)
            else:
                merge_map[k] = hit
        if not merge_map:
            return
        moved = []
        for k0, vset in self._edges.items():
            for k1, cnt in vset.items():
                if k0 in merge_map or k1 in merge_map:
                    if not self.undirected or k0 <= k1:
                        moved.extend([(k0, k1)] * cnt)
        for k0, k1 in moved:
            self._erase(k0, k1)
            a = merge_map.get(k0, k0)
            b = merge_map.get(k1, k1)
            # re-add through add_edge so XOR cancellation re-applies
            self.add_edge(self._pts[a], self._pts[b])

    def _assemble_loop(
        self, k0: tuple, k1: tuple, unused: list
    ) -> np.ndarray | None:
        """Walk left-most turns from edge k0→k1 until a vertex repeats
        (S2PolygonBuilder.php:432-495)."""
        path = [k0, k1]
        index = {k1: 1}
        while len(path) >= 2:
            k0, k1 = path[-2], path[-1]
            v2 = None
            vset = self._edges.get(k1)
            if vset:
                p0, p1 = self._pts[k0], self._pts[k1]
                for k in vset:
                    if k == k0:
                        continue  # ignore the immediate reverse edge
                    if v2 is None or geom.ordered_ccw(
                        p0, self._pts[v2], self._pts[k], p1
                    ):
                        v2 = k
            if v2 is None:
                # dead end: discard this edge and backtrack
                unused.append((self._pts[k0], self._pts[k1]))
                self._erase(k0, k1)
                index.pop(k1, None)
                path.pop()
            elif v2 not in index:
                index[v2] = len(path)
                path.append(v2)
            else:
                loop_keys = path[index[v2]:]
                vv = np.vstack([self._pts[k] for k in loop_keys])
                if self.validate:
                    from .edges import loop_is_valid

                    ok, _why = loop_is_valid(vv)
                    if not ok:
                        m = len(loop_keys)
                        for i in range(m):
                            a, b = loop_keys[i], loop_keys[(i + 1) % m]
                            unused.append((self._pts[a], self._pts[b]))
                            self._erase(a, b)
                        return None
                return vv
        return None

    def _erase_loop(self, vv: np.ndarray) -> None:
        m = len(vv)
        for i in range(m):
            self._erase(self._key(vv[i]), self._key(vv[(i + 1) % m]))

    def assemble_loops(self) -> tuple[list[np.ndarray], list[tuple]]:
        """All assemblable loops + the unused edges
        (S2PolygonBuilder.php:258-310).  Resets the builder."""
        self._merge_vertices()
        loops: list[np.ndarray] = []
        unused: list[tuple] = []
        while self._edges:
            k0 = next(iter(self._edges))
            k1 = next(iter(self._edges[k0]))
            vv = self._assemble_loop(k0, k1, unused)
            if vv is None:
                continue
            # undirected edges may assemble the CW complement first;
            # re-assemble reversed until normalized — guaranteed to
            # shrink (S2PolygonBuilder.php:292-302)
            while self.undirected and not is_normalized(vv):
                nxt = self._assemble_loop(
                    self._key(vv[1]), self._key(vv[0]), unused
                )
                if nxt is None:
                    break
                vv = nxt
            loops.append(vv)
            self._erase_loop(vv)
        return loops, unused

    def assemble_polygon(self) -> tuple[PolygonRegion, list[tuple]]:
        """Loops normalized (each encloses < half sphere, the engine's
        all-CCW convention) and wrapped as a PolygonRegion
        (S2PolygonBuilder.php:334-357)."""
        loops, unused = self.assemble_loops()
        out = []
        for vv in loops:
            if not is_normalized(vv):
                vv = vv[::-1].copy()
            out.append(LoopRegion.from_xyz(vv))
        return PolygonRegion(out), unused
