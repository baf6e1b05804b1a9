"""Capture .explain('formatted') with localCheckpoint patched to
identity, so the WHOLE lazy lineage (normally truncated at each
checkpoint-materialization boundary) is visible in one plan — the
honest way to count corpus text scans per operator.

Usage: PYTHONPATH=<tree> python capture_plans_nockpt.py <out_dir> <suffix> q1 ...
"""

import io
import os
import sys
from contextlib import redirect_stdout

out_dir, suffix = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

from pyspark.sql import DataFrame  # noqa: E402

DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore
try:  # Spark 4: the runtime class is the classic subclass
    from pyspark.sql.classic.dataframe import DataFrame as _CDF  # noqa: E402

    _CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore
except ImportError:
    pass

from iceberg_diag_spark.plans.registry import REGISTRY  # noqa: E402
from iceberg_diag_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
spark = get_spark(app_name="plan-capture-nockpt")
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
