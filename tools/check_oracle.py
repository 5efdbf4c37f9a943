#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--values]

Reads <verifyOutDir>/oracle_sql.json, registers the sfDir parquet tables as DuckDB
views, runs each oracle SQL, and compares against the Spark parquet dump
(<verifyOutDir>/<name>/). Columns are sorted by name before comparing (driver
contract); rows compared in order and, if that fails, as sorted multisets.

Two comparison modes:
  default   — str() of each cell (historical behavior; lenient: Decimal('1.5')
              and 1.5 both stringify to "1.5" and compare equal).
  --values  — repr() of the PYTHON value of each cell, type distinctions and
              all. This replicates the driver's value-hash comparison, which
              hashes the Python objects: a Decimal with a different scale or a
              Decimal-vs-float divergence FAILS here even when the strings
              agree (the r8 q_market_share builder-green/driver-red gap).
              Run the suite in this mode before shipping.
"""
import json
import sys

import duckdb


def _canon(v):
    """Hashable, type-preserving canonical form of one cell value."""
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return repr(v)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, values_mode: bool = False) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        e_cols = sorted(exp.column_names)
        g_cols = sorted(got.column_names)
        if e_cols != g_cols:
            print(f"FAIL {name}: columns differ: oracle={e_cols} spark={g_cols}")
            failures += 1
            continue
        # The driver hashes PYTHON values: a DuckDB HUGEINT (decimal128) from
        # an un-cast SUM() becomes Decimal and hash-mismatches a Spark int64
        # even when every value agrees as a string (broke q_map_at_k and
        # q_user_entropy in r6) — but int8/int32/int64 all become int, so
        # width-only divergence is fine (13 r6-green queries differ in width).
        # Flag only cross-FAMILY divergence.
        def family(t) -> str:
            s = str(t)
            if "int" in s and "decimal" not in s:
                return "int"
            if s in ("float", "double") or s.startswith("halffloat"):
                return "float"
            return s
        tdiff = [(c, str(exp.schema.field(c).type), str(got.schema.field(c).type))
                 for c in e_cols
                 if family(exp.schema.field(c).type) != family(got.schema.field(c).type)]
        if tdiff:
            print(f"FAIL {name}: column type families differ: {tdiff}")
            failures += 1
            continue
        cell = _canon if values_mode else (lambda v: str(v))
        er = [tuple(cell(r[c]) for c in e_cols) for r in exp.to_pylist()]
        gr = [tuple(cell(r[c]) for c in e_cols) for r in got.to_pylist()]
        if er == gr:
            print(f"PASS {name} ({len(er)} rows)")
        elif sorted(er) == sorted(gr):
            print(f"PASS* {name} ({len(er)} rows; row order differs)")
        else:
            print(f"FAIL {name}: rows differ (oracle {len(er)} vs spark {len(gr)})")
            diff = [(a, b) for a, b in zip(er, gr) if a != b][:3]
            for a, b in diff:
                print(f"  oracle: {a}\n  spark : {b}")
            only_e = set(er) - set(gr)
            only_g = set(gr) - set(er)
            for x in list(only_e)[:3]:
                print(f"  only-oracle: {x}")
            for x in list(only_g)[:3]:
                print(f"  only-spark : {x}")
            failures += 1
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sys.exit(1 if main(args[0], args[1], "--values" in flags) else 0)
