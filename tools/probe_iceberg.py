"""Measured-unavailability probe for the Iceberg runtime (round-5 VERDICT
item 4, modeled on the transformWithStateInPandas verdict in
docs/SCALE.md): establish with recorded evidence — not assumption — that
the real `format("iceberg")` branches of sources/iceberg.py cannot be
exercised in this sandbox, and record the exact failure class of each
acquisition path.  Output is pasted into docs/SCALE.md.

Run: python tools/probe_iceberg.py
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    findings: dict[str, str] = {}

    # 1. runtime jar on the installed Spark's classpath?
    jars = glob.glob("/opt/spark/jars/*iceberg*")
    findings["spark_jars"] = f"iceberg jars under /opt/spark/jars: {jars or 'NONE'}"

    # 2. can the jar be fetched? (spark.jars.packages needs Maven access)
    import socket
    import urllib.request

    try:
        socket.setdefaulttimeout(10)
        urllib.request.urlopen("https://repo1.maven.org/maven2/")
        findings["maven_fetch"] = "network OK — spark.jars.packages viable"
    except Exception as exc:  # noqa: BLE001
        findings["maven_fetch"] = f"FAIL: {type(exc).__name__}: {exc}"

    # 3. local pip wheel carrying the runtime (pyiceberg or similar)?
    try:
        import pyiceberg  # noqa: F401

        findings["pyiceberg"] = "importable"
    except ImportError as exc:
        findings["pyiceberg"] = f"FAIL: {exc}"

    # 4. live session: class presence + actual load attempt
    from tokforge.engine.session import build_spark

    spark = build_spark(app_name="tokforge-iceberg-probe", master="local[2]",
                        shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    def _jmsg(exc) -> str:
        j = getattr(exc, "java_exception", None)
        if j is not None:
            try:
                return j.toString()[:200]
            except Exception:  # noqa: BLE001
                pass
        return str(exc).splitlines()[0][:200]

    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        findings["class_forname"] = "SparkCatalog present"
    except Exception as exc:  # noqa: BLE001
        findings["class_forname"] = f"FAIL: {type(exc).__name__}: {_jmsg(exc)}"
    try:
        spark.read.format("iceberg").load("demo.db.tokens")
        findings["format_load"] = "UNEXPECTEDLY SUCCEEDED"
    except Exception as exc:  # noqa: BLE001
        findings["format_load"] = f"FAIL: {type(exc).__name__}: {_jmsg(exc)}"

    from tokforge.sources.iceberg import iceberg_available

    findings["iceberg_available"] = str(iceberg_available(spark))
    spark.stop()

    print(json.dumps(findings, indent=1))


if __name__ == "__main__":
    main()
