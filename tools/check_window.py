"""Pre-flight: run the DRIVER_WINDOW queries through the same parity
compare the driver uses, at the driver's SF (default sf0.01). Usage:

    python tools/check_window.py [sf_dir] [name ...]
    python tools/check_window.py --sentinels [N] [seed] [sf_dir]

(--sentinels arguments are position-bound: N defaults to 8 and seed
to 0, but to pass sf_dir you must spell out both preceding numbers.)

``--sentinels N`` re-verifies N queries sampled (seeded, reproducible)
from OUTSIDE the current driver window — the rotated-out greens whose
recorded driver rows would otherwise go stale silently. The round-4
events-loader regression hid for two rounds exactly because rotated-out
rows were never re-run; sampling a handful each round bounds that
exposure. Prints one line per query; exits nonzero if any fail.
"""

from __future__ import annotations

import random
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

import importlib.util as _ilu
from pathlib import Path as _Path

_spec = _ilu.spec_from_file_location(
    "drive_contract", _Path(__file__).resolve().parent / "drive_contract.py"
)
_dc = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_dc)

from mapreduceframework_spark.plans.registry import DRIVER_WINDOW, all_queries
from mapreduceframework_spark.session import get_session
from mapreduceframework_spark.sources.registry import TABLES
from tests.conftest import assert_parity_frames


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--sentinels":
        if len(argv) > 1 and not argv[1].isdigit():
            raise SystemExit(
                f"--sentinels takes [N >= 1] [seed] [sf_dir] in order; "
                f"got non-positive or non-numeric count {argv[1]!r}"
            )
        n = int(argv[1]) if len(argv) > 1 else 8
        if n < 1:
            raise SystemExit(f"--sentinels count must be >= 1, got {n}")
        seed = int(argv[2]) if len(argv) > 2 else 0
        sf_dir = argv[3] if len(argv) > 3 else "/root/testdata/sf0.01"
        rotated_out = sorted(set(all_queries()) - set(DRIVER_WINDOW))
        names = random.Random(seed).sample(
            rotated_out, min(n, len(rotated_out))
        )
        print(f"sentinels (seed={seed}): {names}", flush=True)
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
        names = list(argv[1:]) or list(DRIVER_WINDOW)
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
                # Collect both sides ONCE, then run BOTH compares on the
                # same frames: assert_parity's canonicalized check, and
                # the driver's own normalize+bag_hash (assert_parity
                # canonicalizes more aggressively — e.g. date columns —
                # so a rendering difference can pass the pre-flight yet
                # MISMATCH in drive_contract: the round-7
                # lakehouse_incremental_agg blind spot).
                sdf_raw = df.toPandas()
                odf_raw = con.execute(spec.oracle).fetchdf()
                assert_parity_frames(sdf_raw.copy(), odf_raw.copy())
                sdf = _dc.normalize(sdf_raw)
                odf = _dc.normalize(odf_raw)
                if len(sdf) != len(odf) or _dc.bag_hash(sdf) != _dc.bag_hash(
                    odf
                ):
                    raise AssertionError(
                        "driver bag_hash mismatch "
                        f"({len(sdf)} vs {len(odf)} rows)"
                    )
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
