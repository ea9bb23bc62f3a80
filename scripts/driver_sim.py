"""Driver-contract simulator: runs queries() vs oracle_sql() exactly as
the grading driver does (sorted-column, 6-decimal value canon).

Usage: python scripts/driver_sim.py [--extra] [query ...]  # no args = all
  --extra: also run the consolidated extra-tier gates
           (registry.extra_queries(), not driver-facing)
Env: SIM_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from information_extraction_for_chinese_nlp_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df):
    cols = sorted(df.columns)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.6f}"
        return str(v)

    return cols, sorted(tuple(norm(v) for v in r) for r in df[cols].itertuples(index=False))


def main() -> int:
    args = sys.argv[1:]
    with_extra = "--extra" in args
    only = {a for a in args if a != "--extra"}
    spark = get_spark("driver-sim", master="local[8]")
    qs, os_ = dict(E.queries()), dict(E.oracle_sql())
    if with_extra or only:
        from information_extraction_for_chinese_nlp_spark.plans import registry

        extra_q, extra_sql = registry.extra_queries(), registry.extra_oracle_sql()
        if with_extra:
            qs.update(extra_q)
            os_.update(extra_sql)
        else:  # named extras resolve too, without needing the flag
            for n in only & set(extra_q):
                qs[n] = extra_q[n]
                if n in extra_sql:
                    os_[n] = extra_sql[n]
    fail = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            got = fn(spark, SF).toPandas()
        except Exception as exc:  # the driver records this as an errored row
            fail += 1
            print(f"ERROR {name}: {exc}")
            continue
        if name in os_:
            try:
                want = duck(os_[name])
            except Exception as exc:
                fail += 1
                print(f"ORACLE-ERROR {name}: {exc}")
                continue
            gc, gr = canon(got)
            wc, wr = canon(want)
            if gc != wc:
                fail += 1
                print(f"SCHEMA-MISMATCH {name}: spark={gc} oracle={wc}")
            elif gr != wr:
                fail += 1
                print(f"VALUE-MISMATCH {name}: spark_rows={len(gr)} oracle_rows={len(wr)}")
                for row in list(set(map(tuple, gr)) - set(map(tuple, wr)))[:3]:
                    print("  spark-only:", row)
                for row in list(set(map(tuple, wr)) - set(map(tuple, gr)))[:3]:
                    print("  oracle-only:", row)
            else:
                print(f"OK {name} rows={len(gr)}")
        else:
            print(f"ROWS {name} rows={len(got)}")
    print("FAILURES:", fail)
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
