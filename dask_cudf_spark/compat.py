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
import tempfile

#: vendored pure-Python protobuf locations probed in order (public
#: Google Cloud SDK layout; extend via SPARK_GRAFT_PROTOBUF_PATH)
_VENDOR_CANDIDATES = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _shim_dir(base: str) -> str:
    """Expose ONLY the ``google/protobuf`` subtree of ``base`` through a
    dedicated directory (a symlink under a throwaway shim root).

    The SDK dir also vendors google.auth / google.oauth2 /
    google.appengine and top-level scripts (api_server, dev_appserver,
    wrapper_util); putting the WHOLE dir on sys.path/PYTHONPATH would
    shadow pip-installed versions of those in the driver and every
    spawned worker.  The vendored ``google`` package has no
    __init__.py (PEP-420 namespace), so a shim holding just the
    protobuf symlink merges cleanly with any site-packages google.*
    distributions.  Falls back to ``base`` itself if the shim can't be
    built (read-only tmp)."""
    shim = os.path.join(tempfile.gettempdir(), "spark-graft-protobuf-shim")
    link = os.path.join(shim, "google", "protobuf")
    target = os.path.join(base, "google", "protobuf")
    try:
        os.makedirs(os.path.join(shim, "google"), exist_ok=True)
        if not os.path.exists(link):
            os.symlink(target, link)
        elif os.path.realpath(link) != os.path.realpath(target):
            os.remove(link)
            os.symlink(target, link)
        return shim
    except OSError:
        return base


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
        # expose only google/protobuf, and APPEND rather than prepend:
        # nothing else provides google.protobuf (we only get here when
        # find_spec failed), so last-position still resolves it and
        # can't shadow anything pip-installed
        path = _shim_dir(base)
        if path not in sys.path:
            sys.path.append(path)
        # propagate to JVM-spawned Python runners (streaming state
        # server workers): they get env, not this process's sys.path
        pp = os.environ.get("PYTHONPATH", "")
        if path not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                (pp + os.pathsep if pp else "") + path
            )
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        if _has_protobuf():
            return True
    return False
