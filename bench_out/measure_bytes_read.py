"""Executed-I/O probe: run registry queries through the noop sink in
one fresh session (UI enabled) and report, per query, the Spark stage
input bytes + total stage count from the status REST API — the honest
executed-scan counter for operators whose corpus scans live inside
checkpoint-materialization jobs (invisible in the final plan). Two
text scans vs one shows up as ~2x corpus input bytes.

Usage: PYTHONPATH=<tree> python measure_bytes_read.py q1 q2 ...
"""

import json
import os
import sys
import time
import urllib.request

names = sys.argv[1:]

from iceberg_diag_spark.plans.registry import REGISTRY  # noqa: E402
from iceberg_diag_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="bytes-read-probe", extra_conf={"spark.ui.enabled": "true"}
)
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId


def input_bytes() -> int:
    data = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    return sum(s.get("inputBytes", 0) for s in data)


out = {}
for name in names:
    before = input_bytes()
    t0 = time.monotonic()
    df = REGISTRY[name].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    out[name] = {
        "input_mb": round((input_bytes() - before) / 1e6, 1),
        "sec": round(dt, 2),
    }
    print(f"# {name}: {out[name]}", file=sys.stderr)
print(json.dumps(out))
spark.stop()
