"""Count py4j round-trips made by a query BUILDER (plan construction
only, no action) — the guide §7.3 driver-chatter metric the round-11/12
builder-cost work optimizes. Each counted call is one Python->JVM
round-trip (~0.1-0.6 ms), so builders inside loops multiply it.

Usage: python tools/py4j_count.py <query> [<query>...]
Prints one line per query: name, py4j_calls, build_sec. Counts are
host-independent (they depend only on the code path), which is what the
driver-cost pin tests assert ranges over.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CallCounter:
    """Counts py4j command round-trips while active (monkeypatches the
    ClientServer/GatewayClient send_command)."""

    def __init__(self) -> None:
        self.n = 0
        self._orig = None

    def __enter__(self):
        import py4j.clientserver as cs

        self._orig = cs.ClientServerConnection.send_command
        counter = self

        def counted(conn, command):
            counter.n += 1
            return counter._orig(conn, command)

        cs.ClientServerConnection.send_command = counted
        return self

    def __exit__(self, *exc):
        import py4j.clientserver as cs

        cs.ClientServerConnection.send_command = self._orig
        return False


def count_build(spark, sf_dir: str, name: str) -> tuple[int, float]:
    from quackio_jl_spark.registry import QUERIES

    t0 = time.perf_counter()
    with CallCounter() as c:
        QUERIES[name](spark, sf_dir)
    return c.n, time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:]
    from quackio_jl_spark.fragcache import release_foreign_storage
    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="py4j_count")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        # warm (fragments, table cache) so the count reflects steady state
        QUERIES[name](spark, sf_dir)
        release_foreign_storage(spark)
        n, dt = count_build(spark, sf_dir, name)
        print(f"{name}: py4j_calls={n} build_sec={dt:.2f}")
        release_foreign_storage(spark)


if __name__ == "__main__":
    main()
