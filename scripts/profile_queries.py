#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds (guide §1):
for every bench-flagged catalog query, capture

- wall time split into plan-build vs execute (the bench's count() drain
  AND the noop sink per guide §1.4, so we can tell how much the final
  orderBy/count shape matters),
- the number of Spark jobs the query submits (setJobGroup + statusTracker
  — extra jobs are hidden actions: .first()/.collect()/createDataFrame),
- the formatted physical plan, written to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/profile_queries.py [--tag r14] [--suffix before]
         [--only name1,name2] [--reps 2] [--no-plans]
Prints one summary line per query and a JSON document to
/tmp/profile_<tag>_<suffix>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink drain per rep")
    args = ap.parse_args()

    from sport_advantages_moderne_data_infrastructure_spark.plans import (
        catalog,
    )
    from sport_advantages_moderne_data_infrastructure_spark.plans import (
        star as _star,
    )
    from sport_advantages_moderne_data_infrastructure_spark.session import (
        get_spark,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("samdis-profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    t0 = time.perf_counter()
    catalog.build_indexes(spark, sf_dir)
    print(f"# index_build: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    bench = list(catalog.bench_queries().items())
    from types import SimpleNamespace
    bench.append(("skew_plain_baseline", SimpleNamespace(
        spark_fn=_star.skew_plain_baseline)))
    only = {s for s in args.only.split(",") if s}
    if only:
        bench = [(n, q) for n, q in bench if n in only]

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    st = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    for rep in range(args.reps):
        for name, q in bench:
            group = f"{name}-rep{rep}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            n = df.count()
            t_exec = time.perf_counter() - t0
            jobs = len(st.getJobIdsForGroup(group))
            rec = out.setdefault(name, {
                "rows": n, "jobs": jobs,
                "build_s": round(t_build, 3),
                "count_s": [], "noop_s": []})
            rec["count_s"].append(round(t_exec, 3))
            rec["jobs"] = min(rec["jobs"], jobs)
            rec["build_s"] = min(rec["build_s"], round(t_build, 3))
            if args.noop:
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                rec["noop_s"].append(round(time.perf_counter() - t0, 3))
            if rep == 0 and not args.no_plans:
                with open(os.path.join(
                        plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()
            spark.sparkContext.setJobGroup("", "")
    for name, rec in out.items():
        rec["count_min_s"] = min(rec["count_s"])
        if rec["noop_s"]:
            rec["noop_min_s"] = min(rec["noop_s"])
        print(f"{name:32s} min {rec['count_min_s']:7.3f}s "
              f"build {rec['build_s']:6.3f}s jobs {rec['jobs']:3d} "
              f"rows {rec['rows']}")
    path = f"/tmp/profile_{args.tag}_{args.suffix}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
