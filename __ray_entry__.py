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

import os
import sys
from collections.abc import Callable
from typing import Any

# make the repo importable no matter the driver's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from osmpbf_ray.pipelines import queries as q  # noqa: E402

# Ray workers are spawned with the DRIVER'S env from ray.init time — if
# the driver initialised Ray from a cwd where osmpbf_ray isn't
# importable, UDFs that unpickle by module reference would fail on the
# workers. Registering every osmpbf_ray module for pickle-BY-VALUE makes
# each UDF ship its own code, so nothing on the worker side ever needs
# to import the package.
try:
    from ray import cloudpickle as _cp

    for _name, _mod in list(sys.modules.items()):
        if _name.startswith("osmpbf_ray") and _mod is not None:
            _cp.register_pickle_by_value(_mod)
except Exception:  # registration is a belt-and-braces fallback only
    pass


def entry() -> Any:
    """Flagship pipeline smoke check on sf0.001 (driver checks rows >= 0)."""
    return q.q_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
