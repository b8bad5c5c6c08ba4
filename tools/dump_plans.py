"""Dump formatted physical plans for the bench headline queries.

Usage:  python tools/dump_plans.py [sf_dir] > PLANS_HEADLINE.md

The plan-audit loop this repo develops by (".explain('formatted'),
iterate until it's the plan you'd want") made repeatable: one command
regenerates the headline plans so a reviewer can read scan pushdowns,
exchange counts, and codegen spans without running anything else.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import bench
    from real_time_trip_processing_project_spark.plans import REGISTRY
    from real_time_trip_processing_project_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", cpus=8, shuffle_partitions=8)
    print(f"# Headline query plans ({sf_dir})\n")
    for name in bench.HEADLINE:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
