"""Driver-simulation: run each queries() entry vs its oracle_sql() twin.

Mimics the driver's comparison: row count, column names/types, and an
order-insensitive value comparison (rows sorted by all columns, columns
sorted by name). Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ocr_image_to_text_spark.cachectl import release_caches  # noqa: E402
from ocr_image_to_text_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_rows(rows):
    def key(r):
        return tuple((v is None, str(v)) for v in r)

    return sorted([tuple(r) for r in rows], key=key)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        finally:
            release_caches()  # bounded block store across the 88-query sweep
        t1 = time.time()
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {t1-t0:.1f}s)")
            if len(srows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            otypes = [str(d[1]) for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            continue
        # align column order by name
        sidx = [scols.index(c) for c in sorted(scols)]
        oidx = [ocols.index(c) for c in sorted(ocols)]
        sn = norm_rows([[r[i] for i in sidx] for r in srows])
        on = norm_rows([[r[i] for i in oidx] for r in orows])
        if len(sn) != len(on):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(on)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sn, on)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
        else:
            print(f"OK   {name}: {len(sn)} rows match ({t1-t0:.1f}s spark) "
                  f"types={dict(zip(sorted(ocols), [otypes[ocols.index(c)] for c in sorted(ocols)]))}")
    print("\nFAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
