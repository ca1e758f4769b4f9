"""Ad-hoc SQL entry point (SURVEY.md §3.4): run any SQL statement over the
registered table catalog — the declarative replacement for the reference's
compile-a-new-Java-class-per-query workflow
(/root/reference/src/StockCount.java:70-83).

Usage:
    python -m mapreduce_stockheadlines_spark.jobs.sql "SELECT ..." \
        [--sf-dir /root/testdata/sf0.01] [--output out.parquet] [--limit 20]

Without ``--output`` the (limited) result prints to stdout; with it, the
full result writes as parquet — never collected to the driver.
"""

from __future__ import annotations

import argparse

from ..plans.catalog import DEFAULT_SF_DIR, register_views
from ..session import get_spark


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--output", default=None, help="parquet output path")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true", help="print the plan too")
    ap.add_argument("--guard", action="store_true",
                    help="refuse plans with scale anti-patterns "
                         "(cartesian/nested-loop joins)")
    args = ap.parse_args(argv)

    spark = get_spark("sql")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, args.sf_dir)
    df = spark.sql(args.query)
    if args.guard:
        from ..plans.guard import assert_scalable

        assert_scalable(df)  # raises PlanGuardError before any execution
    if args.explain:
        df.explain("formatted")
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)


if __name__ == "__main__":
    main()
