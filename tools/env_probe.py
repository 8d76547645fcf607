"""Reproducible probe of the environmental blocks documented in README.

Re-run each round (``python tools/env_probe.py``); prints one JSON
object.  The README's "Environment limits" section cites this so the
"cannot run here" claims are evidence, not assertion:

- ``kafka``: is the spark-sql-kafka connector jar anywhere on disk, is
  any broker binary installed, can any package index be resolved?
- ``protobuf``: does a native google.protobuf import work, does the
  repo-vendored fallback work, and can the Spark TWS proto module load
  with it?
"""

from __future__ import annotations

import glob
import json
import shutil
import socket
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _dns(host: str) -> bool:
    try:
        socket.getaddrinfo(host, 443)
        return True
    except OSError:
        return False


def probe() -> dict:
    out: dict = {}

    # ---- network / package indexes -------------------------------------
    out["network"] = {
        "pypi_resolves": _dns("pypi.org"),
        "maven_resolves": _dns("repo1.maven.org"),
    }

    # ---- kafka ----------------------------------------------------------
    # the places a connector jar could actually be picked up from: the
    # pyspark distribution's jars dir, the ivy/maven caches, system java
    jar_dirs = [Path(p) for p in (
        _pyspark_jars_dir(), "/root/.ivy2", "/root/.m2",
        "/usr/share/java", "/opt/spark",
    ) if p]
    jar_hits: list[str] = []
    for d in jar_dirs:
        if d.is_dir():
            jar_hits += [str(p) for p in d.rglob("*kafka*.jar")]
    out["kafka"] = {
        "connector_jar": jar_hits,
        "broker_binary": shutil.which("kafka-server-start.sh")
        or shutil.which("kafka-server-start"),
        "python_client": _importable("confluent_kafka")
        or _importable("kafka"),
    }

    # ---- protobuf / TWS --------------------------------------------------
    native = _importable("google.protobuf")
    sys.path.insert(0, str(REPO))
    from realtime_log_analytics_flink_kafka_spark.vendor_support import (
        ensure_protobuf)
    vendored = ensure_protobuf()
    tws_proto = vendored and _importable(
        "pyspark.sql.streaming.proto.StateMessage_pb2")
    out["protobuf"] = {
        "native_import": native,
        "vendored_import": vendored,
        "tws_state_proto_loads": tws_proto,
    }
    return out


def _pyspark_jars_dir() -> str | None:
    try:
        import pyspark
        return str(Path(pyspark.__file__).parent / "jars")
    except ImportError:
        return None


def _importable(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except Exception:
        return False


if __name__ == "__main__":
    print(json.dumps(probe(), indent=2))
