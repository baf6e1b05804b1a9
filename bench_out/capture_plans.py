"""Capture .explain('formatted') for a list of registry queries.

Usage: PYTHONPATH=<tree> python capture_plans.py <out_dir> <suffix> q1 q2 ...
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

import io
import os
import sys
from contextlib import redirect_stdout

out_dir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

from iceberg_diag_spark.plans.registry import REGISTRY  # noqa: E402
from iceberg_diag_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark(app_name="plan-capture")
spark.sparkContext.setLogLevel("ERROR")
os.makedirs(out_dir, exist_ok=True)
for name in names:
    try:
        df = REGISTRY[name].build(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
    except Exception as exc:  # keep going; record the failure
        txt = f"PLAN CAPTURE FAILED: {exc}\n"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(txt)
    print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
spark.stop()
