"""Pre-flight: run the DRIVER_WINDOW queries through the same parity
compare the driver uses, at the driver's SF (default sf0.01). Usage:

    python tools/check_window.py [sf_dir] [name ...]

Prints one line per query; exits nonzero if any fail.
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from mapreduceframework_spark.plans.registry import DRIVER_WINDOW, all_queries
from mapreduceframework_spark.session import get_session
from mapreduceframework_spark.sources.registry import TABLES
from tests.conftest import assert_parity


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(DRIVER_WINDOW)
    queries = all_queries()
    spark = get_session(app_name="check-window", cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name in names:
        spec = queries[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is not None:
                assert_parity(df, con, spec.oracle)
                status = "ok"
            else:
                n = df.count()
                status = f"rows-only ok ({n} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {e}"
            failures.append(name)
            traceback.print_exc()
        print(f"{name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} pass", flush=True)
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
