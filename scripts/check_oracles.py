#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: compare Verify's parquet dumps
against the DuckDB oracles in oracle_sql.json. Driver-side tooling only —
not part of the engine. Usage: check_oracles.py <verify_out_dir> <sf_dir>
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


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
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
        else:
            print(f"PASS {name} ({len(want)} rows)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
