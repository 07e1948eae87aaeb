#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [--types-only]

Reads <verify_out_dir>/oracle_sql.json, registers each parquet table from
<sf_dir> as a DuckDB view, runs every oracle query, loads the Spark result
parquet for the same name, canonicalizes both (columns sorted by name,
rows sorted), and reports per-query match status. Dev tool only — the
real gate is the driver's CORRECTNESS_r{N}.json.

Every run also LINTS oracle output dtypes: DuckDB aggregates widen past
what Spark can emit (sum(BIGINT) → HUGEINT, both plain and windowed;
avg(DECIMAL) → DECIMAL), and the driver's hash compare is dtype-
sensitive, so any oracle column outside the Spark-representable set
{BIGINT, INTEGER, DOUBLE, FLOAT, VARCHAR, BOOLEAN, DATE, TIMESTAMP,
BLOB} fails the lint even when the local stringified compare passes —
the exact failure mode of r5's q_llm_pack_budget (uncast `cb // 256`
HUGEINT). `--types-only` runs just the lint (DESCRIBE per oracle, no
Spark results needed).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB dtypes with an exact Spark counterpart (the driver compares
# dtype-sensitively). HUGEINT / DECIMAL / unsigned ints have none.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP", "BLOB"}


def lint_types(con, oracle):
    """DESCRIBE each oracle query; return [(name, col, dtype)] violations."""
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.sql(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, "<describe failed>", str(e)))
            continue
        for row in desc:
            col_name, dtype = row[0], str(row[1]).upper()
            base = dtype.split("(")[0].strip()  # DECIMAL(38,0) → DECIMAL
            # element types inside LIST/STRUCT follow the same rule
            inner = base
            if base.endswith("[]"):
                inner = base[:-2].split("(")[0].strip()
            if inner not in ALLOWED_TYPES:
                bad.append((name, col_name, dtype))
    return bad


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sort across dtypes; round floats to kill ULP noise
    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)
    out = df.apply(lambda c: c.map(norm))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    types_only = "--types-only" in sys.argv[3:]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    type_bad = lint_types(con, oracle)
    for name, colname, dtype in type_bad:
        print(f"TYPE-LINT FAIL {name}: column '{colname}' is {dtype} "
              f"(not Spark-representable — CAST it in the oracle SQL)")
    if types_only:
        print(f"\n{len(oracle)} oracles linted, "
              f"{len(type_bad)} dtype violations")
        sys.exit(1 if type_bad else 0)
    passed, failed = [], []
    for name, sql in sorted(oracle.items()):
        try:
            expect = con.sql(sql).df()
            got = pd.read_parquet(f"{outdir}/{name}")
        except Exception as e:
            failed.append((name, f"load/run error: {e}"))
            continue
        ce, cg = canon(expect), canon(got)
        if list(ce.columns) != list(cg.columns):
            failed.append((name, f"columns differ: oracle={list(ce.columns)} spark={list(cg.columns)}"))
        elif len(ce) != len(cg):
            failed.append((name, f"row count differs: oracle={len(ce)} spark={len(cg)}"))
        elif not ce.equals(cg):
            neq = (ce != cg).any(axis=1)
            idx = list(ce.index[neq])[:3]
            detail = "; ".join(
                f"row {i}: oracle={ce.loc[i].to_dict()} spark={cg.loc[i].to_dict()}"
                for i in idx)
            failed.append((name, f"values differ at {int(neq.sum())} rows. {detail}"))
        else:
            passed.append(name)
    for n in passed:
        print(f"PASS {n}")
    for n, why in failed:
        print(f"FAIL {n}: {why}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, "
          f"{len(oracle)} total oracle queries; "
          f"{len(type_bad)} dtype violations")
    sys.exit(1 if failed or type_bad else 0)


if __name__ == "__main__":
    main()
