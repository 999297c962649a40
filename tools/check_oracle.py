"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (exact after the declared
rounding). Exit non-zero on any mismatch.

Usage: python tools/check_oracle.py [--json OUT.json] [--py-oracles] [sf_dir] [query ...]

--json writes a per-query result map {"name": {"status", "rows", "detail"}}
— the committed full-sweep artifact the driver's sampled CORRECTNESS file is
cross-checked against (VERDICT r3 item 4).

--py-oracles swaps in a pandas oracle (PY_ORACLES below) for the queries
that have one, replacing SQL oracles that are correct but asymptotically
infeasible at larger SF. Today that is only near_dup_components: the
recursive-CTE transitive closure enumerates reach×edges (quadratic in
component size — measured >25 min on the 5.1M-edge sf0.1 pair graph), while
the union-find here is O(E α(N)) over the SAME DuckDB-computed verified-pair
set, so the pair semantics stay independently derived from the SQL text.
The driver's sf0.01 gate still runs the pure-SQL closure — both oracle
implementations remain exercised.
"""

from __future__ import annotations

import glob
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    return v


def norm_df(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _py_oracle_near_dup_components(con: "duckdb.DuckDBPyConnection") -> pd.DataFrame:
    """Union-find min-root closure over the exhaustive verified-pair SQL —
    same semantics as the recursive-CTE oracle (`_oracle_near_dup_components`
    in __spark_entry__), without its quadratic reach⋈edges blow-up. Mirrors
    the property-tested reference in tests/test_properties.py::_cc_py."""
    import __spark_entry__ as entrymod

    pairs = con.execute(entrymod._ORACLE_MINHASH_VERIFIED).df()
    docs = con.execute("SELECT doc_id FROM documents").df()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"].tolist(), pairs["id_b"].tolist()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = docs["doc_id"].tolist()
    return pd.DataFrame(
        {"doc_id": ids, "component_id": [find(int(d)) if d in parent else d for d in ids]}
    )


def _py_oracle_leakage_safe_split(con: "duckdb.DuckDBPyConnection") -> pd.DataFrame:
    """leakage_safe_split = union-find components (above) + the MINSTD band
    arithmetic of _ORACLE_CORPUS_SPLIT over the component id — the same
    composition the SQL oracle expresses, minus the quadratic closure."""
    comp = _py_oracle_near_dup_components(con)
    k = comp["component_id"].astype("int64") % 2147483647
    h = (((k * 48271 + 13) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647
    split = pd.Series("test", index=comp.index)
    split[h < 1932735282] = "val"
    split[h < 1717986917] = "train"
    return pd.DataFrame(
        {
            "doc_id": comp["doc_id"],
            "split_key": comp["component_id"],
            "split": split,
        }
    )


def _py_oracle_dedup_keep_best(con: "duckdb.DuckDBPyConnection") -> pd.DataFrame:
    """dedup_keep_best = union-find components (above) + the SAME filtered
    quality SQL the recursive-CTE oracle splices (_oracle_quality_filtered
    — the legacy _oracle_quality counts a blank text as 1 token and could
    pick a different winner) + a pandas per-component argmax
    (score DESC, doc_id ASC)."""
    import __spark_entry__ as entrymod

    comp = _py_oracle_near_dup_components(con)
    qual = con.execute(entrymod._oracle_quality_filtered()).df()
    m = comp.merge(qual, on="doc_id")
    m = m.sort_values(["component_id", "quality", "doc_id"],
                      ascending=[True, False, True], kind="mergesort")
    winners = set(m.groupby("component_id", sort=False).head(1)["doc_id"])
    return pd.DataFrame(
        {
            "doc_id": m["doc_id"],
            "component_id": m["component_id"],
            "score": m["quality"],
            "kept": m["doc_id"].isin(winners),
        }
    )


# query name → fn(duckdb_con) -> DataFrame; used only under --py-oracles.
PY_ORACLES = {
    "near_dup_components": _py_oracle_near_dup_components,
    "leakage_safe_split": _py_oracle_leakage_safe_split,
    "dedup_keep_best": _py_oracle_dedup_keep_best,
}


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    py_oracles = False
    if "--py-oracles" in argv:
        py_oracles = True
        argv.remove("--py-oracles")
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT.json] [--note TEXT] [sf_dir] [query ...]")
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # Provenance note embedded in the artifact — a regenerated sweep must not
    # silently drop HOW it was run (golden swaps, --py-oracles) or the
    # artifact stops being reproducible from its own contents.
    note = None
    if "--note" in argv:
        i = argv.index("--note")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [--json OUT.json] [--note TEXT] [sf_dir] [query ...]")
            return 2
        note = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results: dict[str, dict] = {}

    import __spark_entry__ as entrymod
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"status": "spark_error", "detail": str(e)[:300]}
            print(f"{name:24s} SPARK-ERROR {str(e).splitlines()[0][:120]}")
            continue
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(got_df)}
            print(f"{name:24s} rows-only   rows={len(got_df)}")
            continue
        try:
            if py_oracles and name in PY_ORACLES:
                want_df = PY_ORACLES[name](con)
            else:
                want_df = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            results[name] = {"status": "oracle_error", "detail": str(e)[:300]}
            print(f"{name:24s} ORACLE-ERROR {str(e).splitlines()[0][:120]}")
            continue
        problems = []
        if sorted(got_df.columns) != sorted(want_df.columns):
            problems.append(f"columns {sorted(got_df.columns)} vs {sorted(want_df.columns)}")
        if len(got_df) != len(want_df):
            problems.append(f"rowcount {len(got_df)} vs {len(want_df)}")
        if not problems:
            g, w = norm_df(got_df), norm_df(want_df)
            if g != w:
                diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            results[name] = {"status": "mismatch", "rows": len(got_df), "detail": "; ".join(problems)[:300]}
            print(f"{name:24s} MISMATCH    {problems[0][:160]}")
        else:
            results[name] = {"status": "ok", "rows": len(got_df)}
            print(f"{name:24s} OK          rows={len(got_df)}")

    if json_out:
        import json

        payload = {"sf_dir": sf_dir, "n_queries": len(results),
                   "n_failures": len(failures), "py_oracles": py_oracles,
                   "results": results}
        if note:
            payload["note"] = note
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
