#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: compare Verify's parquet dumps
against the DuckDB oracles in oracle_sql.json. Driver-side tooling only —
not part of the engine. Usage: check_oracles.py <verify_out_dir> <sf_dir> [q1,q2]
(the optional third arg restricts the check to a comma-separated subset,
matching a subset `graft.Verify` run)
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def kind(dtype) -> str:
    """Collapse pandas dtypes to the families the driver's hash is sensitive
    to: int64 vs float64 vs everything-else. Width differences (int32/int64)
    are harmless; int-vs-float is exactly the q_g1/q_l3 HUGEINT trap."""
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "object"


def cmp_cell(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def main(out_dir: str, sf_dir: str, only: str = "") -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = set(only.split(","))
        missing = names - oracles.keys()
        if missing:
            print(f"FAIL: unknown query names {sorted(missing)}")
            return 1
        oracles = {k: v for k, v in oracles.items() if k in names}
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            # DuckDB HUGEINT (sum(BIGINT) etc.) round-trips through pandas as
            # float64, which the driver hashes differently from Spark's int64.
            # rel.types comes from the plan, so this fails BEFORE paying the
            # (possibly expensive) oracle execution.
            huge = [c for c, t in zip(rel.columns, rel.types)
                    if str(t).upper() in ("HUGEINT", "INT128", "UHUGEINT")]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                      f"add CAST(... AS BIGINT)")
                failed.append(name)
                continue
            want = canon(rel.fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failed.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failed.append(name)
            continue
        bad = None
        for i in range(len(want)):
            for c in want.columns:
                if not cmp_cell(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: got {bad[2]!r} want {bad[3]!r}")
            failed.append(name)
            continue
        # Values match — now assert dtype families match, since the driver
        # hashes typed values (int64 vs float64 differ even when equal).
        dk = [(c, kind(got[c].dtype), kind(want[c].dtype)) for c in want.columns
              if kind(got[c].dtype) != kind(want[c].dtype)]
        if dk:
            print(f"FAIL {name}: dtype mismatch {dk} (spark vs oracle)")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(want)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else ""))
