"""Golden-VALUES DuckDB oracles for engine-only queries.

The expected result sets are PRECOMPUTED by ``tools/make_golden_sql.py``
from implementations independent of the Spark engine (oracle/minitiler
pixel oracle, pure-NumPy H3/S2 kernels, oracle/sparkhash XXH64 twin,
plain-Python banding/LSH/IVF logic) and committed as
``tests/golden/values/<query>.json``. This module renders each set as a
self-contained ``SELECT ... FROM (VALUES ...)`` statement so the driver's
DuckDB gate can verify the Spark result row-for-row (count + schema +
value hash) — the same bar the relational queries clear.

Table-reading goldens (h3_s2_assign, h3_rollup, simhash,
minhash_lsh_pairs, ann_*) are pinned to sf0.01, the driver's CORRECTNESS
scale; fixture-driven goldens (pyramid/warp/cutline/image features) are
sf-independent.
"""

from __future__ import annotations

import json
import os

_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests", "golden", "values"
)

_DUCK_TYPES = {
    "int32": "INTEGER",
    "int64": "BIGINT",
    "float64": "DOUBLE",
    "str": "VARCHAR",
    "bool": "BOOLEAN",
}


def _lit(v, t: str) -> str:
    if v is None:
        return "NULL"
    if t == "bool":
        return "TRUE" if v else "FALSE"
    if t == "str":
        return "'" + str(v).replace("'", "''") + "'"
    if t == "float64":
        f = float(v)
        # bare nan/inf tokens are invalid SQL numeric literals inside a
        # VALUES list — render non-finite doubles via a typed CAST instead
        if f != f:
            return "CAST('nan' AS DOUBLE)"
        if f == float("inf"):
            return "CAST('infinity' AS DOUBLE)"
        if f == float("-inf"):
            return "CAST('-infinity' AS DOUBLE)"
        return repr(f)  # shortest round-trip decimal -> exact double
    return str(int(v))


def golden_values_sql(name: str) -> str | None:
    """VALUES-table oracle SQL for `name`, or None if no golden exists."""
    path = os.path.join(_GOLDEN_DIR, f"{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    cols, types = d["columns"], d["types"]
    sel = ", ".join(f"CAST({c} AS {_DUCK_TYPES[t]}) AS {c}" for c, t in zip(cols, types))
    if not d["rows"]:
        # an empty expected set is a valid oracle — VALUES () is not SQL,
        # so emit a correctly-typed zero-row relation instead
        nulls = ", ".join(f"NULL AS {c}" for c in cols)
        return (
            f"-- golden oracle precomputed by tools/make_golden_sql.py (engine-independent)\n"
            f"SELECT {sel} FROM (SELECT {nulls}) AS t({', '.join(cols)}) WHERE FALSE"
        )
    rows = ", ".join(
        "(" + ", ".join(_lit(v, t) for v, t in zip(row, types)) + ")" for row in d["rows"]
    )
    return (
        f"-- golden oracle precomputed by tools/make_golden_sql.py (engine-independent)\n"
        f"SELECT {sel} FROM (VALUES {rows}) AS t({', '.join(cols)})"
    )
