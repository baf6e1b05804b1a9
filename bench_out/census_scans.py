"""Plan census: count `Scan parquet` / Exchange / Window / Sort nodes
in every registry entry's final plan, to find operators whose lazy
lineage replays the corpus scan per consumer (guide §1.3 / §2.4).

Eager entries (executing sinks, streaming drains) EXECUTE on build —
run at sf0.001 so the census stays cheap; their "plan" is the plan of
the returned (already-materialized) relation, so they are reported
but their node counts are not meaningful (usually 0 scans).

Usage: python bench_out/census_scans.py [out.json] [name ...]
"""

import io
import json
import os
import sys
from contextlib import redirect_stdout

from iceberg_diag_spark.plans.registry import REGISTRY
from iceberg_diag_spark.session import get_spark

out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/census_scans.json"
names = sys.argv[2:] or sorted(REGISTRY)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
spark = get_spark(app_name="census-scans")
spark.sparkContext.setLogLevel("ERROR")

res = {}
for name in names:
    try:
        df = REGISTRY[name].build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        res[name] = {
            "scan_parquet": txt.count("Scan parquet"),
            "exchange": txt.count("Exchange"),
            "window": txt.count(") Window"),
            "sort": txt.count(") Sort"),
            "smj": txt.count("SortMergeJoin"),
            "bhj": txt.count("BroadcastHashJoin"),
            "scan_existing_rdd": txt.count("Scan ExistingRDD"),
        }
    except Exception as exc:
        res[name] = {"error": str(exc)[:200]}
    print(f"# {name}: {res[name]}", file=sys.stderr)

with open(out_path, "w") as f:
    json.dump(res, f, indent=1, sort_keys=True)
spark.stop()
