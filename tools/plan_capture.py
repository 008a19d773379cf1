"""Capture .explain("formatted") for named declared queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
artifact (before/after plan diffs the judge can read without Spark).

Usage: python tools/plan_capture.py <tag> <before|after> q1 [q2 ...]

NB: this always captures the FINAL frame's plan.  Audit-row queries
whose result is a driver-built LocalRelation show a trivial plan
here; capture their constituent pipelines by hand (the r14
minhash_pairs_xx_audit_* files were produced that way).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from flox_spark.session import get_spark


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_capture")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
