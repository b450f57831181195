#!/usr/bin/env python
"""sf1 batch-visibility probe under the round-13 scale-indexed gate
(BASELINE.md): runs bench.py's exact visibility cycle (median-of-3 full
apply->frontier->completeness cycles) at $SPARK_GRAFT_SF_DIR and prints
the measurement next to the gate. Closes VERDICT r12 #5's evidence ask.

Usage: SPARK_GRAFT_SF_DIR=/tmp/pcr_sf1 python scripts/visibility_probe_r13.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (bench reads SPARK_GRAFT_SF_DIR at import)
from postgres_cdc_reconciliation_spark.session import get_spark  # noqa: E402


def main():
    spark = get_spark(app_name="visibility-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.path.basename(bench.SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 1.0 if "sf1" in bench.SF_DIR else 0.1
    gate = max(10.0, 25.0 * sf_num)
    spark.read.parquet(f"{bench.SF_DIR}/lineitem.parquet").count()
    vis = bench._batch_visibility_sec(spark)
    verdict = "GREEN" if vis <= gate else "BREACH"
    print(f"sf_dir={bench.SF_DIR} batch_visibility={vis:.2f}s gate={gate}s {verdict}")


if __name__ == "__main__":
    main()
