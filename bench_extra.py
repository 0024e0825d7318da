"""Round-9 optimization harness — measurement only, never the scored bench.

`bench.py` is frozen for measurement (the driver times rounds with its
round-start copy); this file holds the EXTRA instrumentation the
optimization round needs:

  * ``plans``   — dump ``explain('formatted')`` for every declared query
                  (or a named subset) to a directory, for before/after
                  plan-diff evidence (guide §1 / §7.2).
  * ``time``    — per-query noop-sink walls with bench.py's exact
                  methodology (same session config, worker pre-spawn,
                  clearCache between passes, min-of-N over INTERLEAVED
                  whole-list passes) but on an arbitrary subset and rep
                  count, so one query can be isolated without a 20-minute
                  full run.

Usage:
    python bench_extra.py plans  plans/r09 [name ...]
    python bench_extra.py time   [-rN] name [name ...]

Environment: same contract as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SHUFFLE_PARTS = 64  # bench.py's fixed value — plans must match the bench


def _session(tag: str):
    from pbx_ds_ocr_server_spark.session import get_spark

    return get_spark(
        app_name=f"pbx-bench-extra-{tag}",
        master=f"local[{CPUS}]",
        shuffle_partitions=SHUFFLE_PARTS,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _prespawn(spark):
    spark.range(CPUS * 8, numPartitions=CPUS).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()


def dump_plans(outdir: str, names: list[str]) -> None:
    import __spark_entry__ as entry_mod

    os.makedirs(outdir, exist_ok=True)
    spark = _session("plans")
    try:
        qs = entry_mod.queries()
        todo = names or list(qs)
        for name in todo:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}.txt")
            with open(path, "w") as f:
                f.write(plan)
            n_ex = plan.count("Exchange")
            print(f"{name}: {n_ex} Exchange -> {path}", flush=True)
    finally:
        spark.stop()


def time_queries(names: list[str], reps: int) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    spark = _session("time")
    walls: dict[str, list] = {n: [] for n in names}
    try:
        _prespawn(spark)
        qs = entry_mod.queries()
        for _ in range(reps):
            spark.catalog.clearCache()
            for name in names:
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[name].append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
    out = {}
    for name in names:
        out[name] = round(min(walls[name]), 3)
        print(
            f"{name}: min={out[name]}  all="
            f"{[round(x, 2) for x in walls[name]]}",
            flush=True,
        )
    return out


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "plans":
        outdir, names = rest[0], rest[1:]
        dump_plans(outdir, names)
        return 0
    if cmd == "time":
        reps = 3
        if rest and rest[0].startswith("-r"):
            reps = int(rest[0][2:])
            rest = rest[1:]
        time_queries(rest, reps)
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
