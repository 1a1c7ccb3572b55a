"""Phase-decomposed timing probe: for each pass of each named query,
print build (Python/py4j plan construction, incl. fanout's .rdd probes),
action (noop write), and release (foreign-storage cleanup) seconds
separately — locates whether time goes to the driver's Python side, the
JVM planning, or task execution.

Usage: python tools/probe_phases.py <repeats> <query> [<query>...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = int(sys.argv[1])
    names = sys.argv[2:]
    from quackio_jl_spark.fragcache import release_foreign_storage
    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="probe_phases")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    for name in names:
        for i in range(repeats):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            release_foreign_storage(spark)
            t3 = time.perf_counter()
            print(
                f"{name} pass{i}: build={t1 - t0:.2f} action={t2 - t1:.2f}"
                f" release={t3 - t2:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
