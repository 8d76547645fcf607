"""Vendored-dependency bootstrap.

The Spark 4 ``transformWithStateInPandas`` Python state client speaks
protobuf to the JVM state server (``pyspark.sql.streaming.proto``), so
an image without the ``protobuf`` package holds the TWS API but cannot
run it.  This repo vendors the pure-Python protobuf runtime (BSD
licensed, see ``vendor/google/protobuf``) as a fallback for exactly that
case; environments with their own protobuf install are preferred and
untouched.

Call :func:`ensure_protobuf` BEFORE building a SparkSession: the TWS
Python workers are spawned by the JVM and resolve imports from the
``PYTHONPATH`` the JVM inherited, so the vendor path must be in the
environment before the JVM starts.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_VENDOR_DIR = Path(__file__).resolve().parent.parent / "vendor"


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, vendoring if necessary.

    Returns True when the runtime is importable (native install or the
    vendored fallback), False when neither exists.  Idempotent.
    """
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        pass
    if not (_VENDOR_DIR / "google" / "protobuf").is_dir():
        return False
    vendor = str(_VENDOR_DIR)
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    prev = os.environ.get("PYTHONPATH", "")
    if vendor not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            vendor + (os.pathsep + prev if prev else ""))
    # The vendored runtime is 6.32; Spark's generated StateMessage_pb2
    # declares gencode 6.33.  One minor version apart is wire-compatible;
    # protobuf's own escape hatch skips the over-strict validator rather
    # than us patching the vendored source.
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK",
                          "true")
    # No upb C extension in the vendored copy: pin the pure-Python impl
    # so the resolution never half-imports a missing extension.
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION",
                          "python")
    try:
        import google.protobuf  # noqa: F401
        return True
    except ImportError:
        return False
