"""Per-pass timing probe: run named queries N passes in one fresh session,
printing EVERY pass's wall-clock (not just the median) — distinguishes a
bimodal plan (AQE strategy flapping, cache interactions) from host noise.

Usage: python tools/probe_passes.py <repeats> <query> [<query>...]
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

    spark = get_spark(app_name="probe_passes")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobDescription(f"probe:{name}")
        ts = []
        for i in range(repeats):
            t0 = time.perf_counter()
            run(QUERIES[name](spark, sf_dir))
            ts.append(time.perf_counter() - t0)
            release_foreign_storage(spark)
        print(f"{name}: " + " ".join(f"{t:.2f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
