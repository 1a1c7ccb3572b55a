"""Round-11 pollution diagnosis #2: identify WHICH session resource
degrades repeated-query throughput (code cache? metaspace? classes?
JIT? Python workers?). Runs the probe fresh, pollutes with the suite,
then re-probes several times while printing JVM pool / compiler /
worker stats."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from quackio_jl_spark.registry import QUERIES  # noqa: E402
from quackio_jl_spark.session import get_spark  # noqa: E402

PROBE = "text_compressibility_ratio"


def jvm_pools(spark):
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    out = {}
    it = mf.getMemoryPoolMXBeans().iterator()
    while it.hasNext():
        p = it.next()
        u = p.getUsage()
        out[p.getName()] = {
            "used_mb": round(u.getUsed() / 2**20, 1),
            "max_mb": round(u.getMax() / 2**20, 1) if u.getMax() > 0 else None,
        }
    cl = mf.getClassLoadingMXBean()
    comp = mf.getCompilationMXBean()
    out["classes_loaded"] = cl.getLoadedClassCount()
    out["classes_unloaded"] = cl.getUnloadedClassCount()
    out["jit_total_s"] = round(comp.getTotalCompilationTime() / 1000.0, 1)
    return out


def pyworkers():
    try:
        r = subprocess.run(
            ["ps", "-eo", "rss,cmd"], capture_output=True, text=True
        ).stdout.splitlines()
        w = [ln for ln in r if "pyspark.daemon" in ln or "pyspark.worker" in ln]
        rss = sum(int(ln.split()[0]) for ln in w) / 1024
        return {"n_pyworkers": len(w), "pyworkers_rss_mb": round(rss, 0)}
    except Exception:
        return {}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="diag_pollution2")

    def run(name):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run(PROBE)
    print(json.dumps({"phase": "fresh", PROBE: run(PROBE)}))
    print(json.dumps({"fresh_pools": jvm_pools(spark), **pyworkers()}))
    names = bench.HEADLINE + bench.EXTENDED
    t0 = time.perf_counter()
    for i, name in enumerate(names):
        run(name)
        if i % 25 == 24:
            p = jvm_pools(spark)
            small = {
                k: v
                for k, v in p.items()
                if "CodeHeap" in k or k in ("Metaspace", "classes_loaded", "jit_total_s")
            }
            print(json.dumps({"phase": f"after_{i + 1}",
                              "elapsed": round(time.perf_counter() - t0, 1),
                              **pyworkers(), "pools": small}))
    print(json.dumps({"phase": "suite_done",
                      "suite_s": round(time.perf_counter() - t0, 1)}))
    for k in range(3):
        print(json.dumps({"phase": f"probe_{k}", PROBE: run(PROBE)}))
    print(json.dumps({"polluted_pools": jvm_pools(spark), **pyworkers()}))


if __name__ == "__main__":
    main()
