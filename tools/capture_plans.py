"""Capture .explain('formatted') for named queries into plans/r08/.

Usage: python tools/capture_plans.py <suffix> name1 name2 ...
Writes plans/r08/<name>_<suffix>.txt
"""
import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from firebase_realtime_database_backup_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR constructing {name}: {exc!r}"
        out = f"/root/repo/plans/r08/{name}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(name, "->", out, len(plan), "chars")


if __name__ == "__main__":
    main()
