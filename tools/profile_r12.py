"""Round-11 optimization profiler: time individual registry queries
with the noop sink (guide §1.4) and capture .explain("formatted") to
plans/r12/<name>_<tag>.txt (guide §1/§7.2).

Usage:
    PROFILE_TAG=before python tools/profile_r12.py [sf_dir] name [name ...]

Timing methodology matches bench.py: best-of-reps on a warm plan, the
noop sink so the computation (not collect/serialization) is timed; the
query builder runs inside the timed region because several operators do
bounded driver-side work (model training collects) that is part of
their cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finding_similar_high_dimensional_items_for_big_data_sets_spark.plans.queries import (  # noqa: E402
    REGISTRY,
)
from finding_similar_high_dimensional_items_for_big_data_sets_spark.session import (  # noqa: E402
    get_spark,
)


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    tag = os.environ.get("PROFILE_TAG", "before")
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-bench")
    spark = get_spark("fshdi-profile-r12")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(plans_dir, exist_ok=True)
    for name in args:
        fn = REGISTRY[name]
        df = fn(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(explain_str(df))
        spark.sparkContext.setJobDescription(f"profile:{name}")

        def run():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        run()  # warm: codegen + first parquet scan
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(times):.3f}s reps={[round(x, 3) for x in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
