"""Capture `.explain("formatted")` for named queries into plans/<tag>/.

Usage: python tools/capture_plans.py <suffix> <query> [<query>...]
Writes plans/r11/<query>_<suffix>.txt for each query (the optimization
round's before/after plan evidence).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from quackio_jl_spark.registry import QUERIES
    from quackio_jl_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure as evidence too
            text = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"captured {name}_{suffix}.txt ({len(text)} bytes)")


if __name__ == "__main__":
    main()
