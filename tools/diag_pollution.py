"""Diagnose extended-bench session-position pollution (round 11).

Times text_compressibility_ratio on a fresh session, runs one pass of the
full HEADLINE+EXTENDED suite, re-times it, and prints storage/GC/heap
accounting along the way, so the pollution mechanism (accumulated
persisted blocks vs GC pressure vs Python workers) is measured rather
than guessed. Optional --cleanup flag exercises the candidate fix
(release all non-fragment persisted storage between queries).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from quackio_jl_spark.registry import QUERIES  # noqa: E402
from quackio_jl_spark.session import get_spark  # noqa: E402

PROBE = "text_compressibility_ratio"


def jvm_stats(spark):
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    prdds = jsc.getPersistentRDDs()
    infos = jsc.getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    mf = sc._jvm.java.lang.management.ManagementFactory
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    gc_ms = 0
    it = mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        gc_ms += it.next().getCollectionTime()
    return {
        "n_persistent_rdds": prdds.size(),
        "cached_mem_mb": round(mem / 2**20, 1),
        "cached_disk_mb": round(disk / 2**20, 1),
        "heap_used_gb": round(heap.getUsed() / 2**30, 2),
        "gc_total_s": round(gc_ms / 1000.0, 1),
    }


def top_storage(spark, k=12):
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    rows = sorted(
        (
            (i.memSize() + i.diskSize(), i.id(), i.name(), i.numCachedPartitions())
            for i in infos
        ),
        reverse=True,
    )[:k]
    return [
        {"id": rid, "mb": round(sz / 2**20, 1), "parts": np, "name": (nm or "")[:90]}
        for sz, rid, nm, np in rows
    ]


def main():
    cleanup = "--cleanup" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="diag_pollution")

    def run(name):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def release(_):
        pass

    if cleanup:
        from quackio_jl_spark import fragcache

        def release(spark):  # noqa: F811
            fragcache.release_foreign_storage(spark)

    # warm-up probe twice (codegen constants), then fresh timing
    run(PROBE)
    print(json.dumps({"phase": "fresh", PROBE: run(PROBE), **jvm_stats(spark)}))
    t_suite0 = time.perf_counter()
    slow = {}
    for i, name in enumerate(bench.HEADLINE + bench.EXTENDED):
        t = run(name)
        slow[name] = t
        release(spark)
        if i % 25 == 24:
            print(json.dumps({"phase": f"after_{i + 1}", **jvm_stats(spark)}))
    suite_s = round(time.perf_counter() - t_suite0, 1)
    print(json.dumps({"phase": "suite_done", "suite_one_pass_s": suite_s,
                      **jvm_stats(spark)}))
    print(json.dumps({"phase": "polluted", PROBE: run(PROBE), **jvm_stats(spark)}))
    print(json.dumps({"top_storage": top_storage(spark)}))
    top = sorted(slow.items(), key=lambda kv: -kv[1])[:15]
    print(json.dumps({"suite_top15": [[n, t] for n, t in top]}))


if __name__ == "__main__":
    main()
