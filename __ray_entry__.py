"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in osmpbf_ray) calls ``ray.init()`` / ``ray.shutdown()``.

``entry()`` runs the flagship spatial-join + tiling pipeline on the
sf0.001 tables' derived inputs; ``queries()`` / ``oracle_sql()`` expose
the full operator registry (osmpbf_ray/pipelines/queries.py) — one entry
per operator family from SURVEY.md §2 plus the engine-new spatial /
dedup / text / ANN operators, SQL-oracled wherever expressible.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from osmpbf_ray.pipelines import queries as q


def entry() -> Any:
    """Flagship pipeline smoke check on sf0.001 (driver checks rows >= 0)."""
    return q.q_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
