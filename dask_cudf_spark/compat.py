"""Optional-dependency shims.

ensure_protobuf: make ``google.protobuf`` importable when no protobuf
wheel is installed but a vendored pure-Python copy exists on the host
(e.g. the one the public Google Cloud SDK ships under
``platform/google_appengine``).  transformWithStateInPandas needs the
protobuf runtime in BOTH the driver process and the JVM-spawned Python
streaming runner, so this must run BEFORE the SparkSession's JVM is
launched: the runner inherits the JVM's environment, and the JVM
inherits ours — hence the os.environ updates, not just sys.path.

The vendored runtime may be a minor version behind the gencode pyspark
ships; protobuf's cross-version guarantee makes that combination safe
for the wire format, and the runtime provides the official
``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` escape for exactly this
gencode-slightly-newer case (google/protobuf/runtime_version.py in any
protobuf release).
"""

from __future__ import annotations

import importlib.util
import os
import sys

#: vendored pure-Python protobuf locations probed in order (public
#: Google Cloud SDK layout; extend via SPARK_GRAFT_PROTOBUF_PATH)
_VENDOR_CANDIDATES = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _has_protobuf() -> bool:
    try:
        # find_spec raises ModuleNotFoundError when the PARENT package
        # ('google') is itself absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def ensure_protobuf() -> bool:
    """Make google.protobuf importable (driver + spawned workers).
    Returns True if the runtime is available after the call."""
    if _has_protobuf():
        return True
    candidates = list(_VENDOR_CANDIDATES)
    extra = os.environ.get("SPARK_GRAFT_PROTOBUF_PATH")
    if extra:
        candidates.insert(0, extra)
    for base in candidates:
        if not os.path.isdir(os.path.join(base, "google", "protobuf")):
            continue
        if base not in sys.path:
            sys.path.insert(0, base)
        # propagate to JVM-spawned Python runners (streaming state
        # server workers): they get env, not this process's sys.path
        pp = os.environ.get("PYTHONPATH", "")
        if base not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                base + (os.pathsep + pp if pp else "")
            )
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        if _has_protobuf():
            return True
    return False
