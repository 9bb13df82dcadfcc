"""Blast radius: downstream-lineage impact of an unhealthy partition.

Reference semantics (blast_radius.py:8-92): downstream table closure from
the lineage API (root + transitive downstream), total query count over
that closure from the popularity API, and an impact level from verbatim
thresholds (≤30→1, ≤300→2, ≤3000→3, else 4; blast_radius.py:70-79).
Attached to UNHEALTHY verdicts only (dispatcher F12,
freshness_utils.py:739-752).

No control-plane APIs exist here, so lineage and popularity are plain
inputs: ``lineage`` maps each unit (dataset/partition id) to its DIRECT
downstream units, ``popularity`` maps unit → query count.  Both are
small driver-side metadata (broadcast-size, J1 pattern).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Sequence


@dataclass(frozen=True)
class BlastRadiusInfo:
    """reference blast_radius_info.py:8-16"""

    impact_level: int
    num_downstream_tables: int
    num_queries_on_affected_tables: int

    def as_struct(self) -> dict:
        return {
            "impact_level": self.impact_level,
            "num_downstream_tables": self.num_downstream_tables,
            "num_queries_on_affected_tables": self.num_queries_on_affected_tables,
        }


def determine_impact_level(num_queries_impacted: int) -> int:
    """Verbatim thresholds (reference blast_radius.py:70-79)."""
    if num_queries_impacted <= 30:
        return 1
    if num_queries_impacted <= 300:
        return 2
    if num_queries_impacted <= 3000:
        return 3
    return 4


def downstream_closure(lineage: Mapping[str, Sequence[str]], root: str) -> list[str]:
    """Root plus every transitively-downstream unit, BFS order, cycle-safe
    (reference get_downstream_tables returns root + downstream list)."""
    seen = {root}
    order = [root]
    frontier = [root]
    while frontier:
        nxt = []
        for u in frontier:
            for d in lineage.get(u, ()):
                if d not in seen:
                    seen.add(d)
                    order.append(d)
                    nxt.append(d)
        frontier = nxt
    return order


def get_blast_radius(
    root: str,
    lineage: Mapping[str, Sequence[str]],
    popularity: Mapping[str, int],
) -> BlastRadiusInfo:
    """reference get_blast_radius (blast_radius.py:82-92)."""
    closure = downstream_closure(lineage, root)
    num_queries = sum(int(popularity.get(u, 0)) for u in closure)
    return BlastRadiusInfo(
        impact_level=determine_impact_level(num_queries),
        num_downstream_tables=len(closure) - 1,
        num_queries_on_affected_tables=num_queries,
    )
