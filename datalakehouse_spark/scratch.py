"""Session-scoped scratch directories for registry entries that
materialize fixtures (ingest round-trips, versioned tables, the IVF
index).

Every entry used to ``tempfile.mkdtemp`` a fresh directory per
invocation and never remove it, so each bench/driver run leaked
fixture-sized trees into /tmp.  All scratch now lives under ONE
per-process root that is removed at interpreter exit; per-entry
subdirectories are wiped on re-entry, so repeated invocations within a
session reuse (not accumulate) space.

The cleanup is atexit- rather than finally-scoped on purpose: registry
callables return LAZY DataFrames whose scans read these paths when the
driver later collects them — deleting before materialization would
break every consumer.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="dlh_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def fresh_scratch(tag: str) -> str:
    """A per-invocation-fresh directory (wiped if it already exists)
    under the session root.  Use for entries that replay a commit
    sequence (versioned tables) or write with append semantics."""
    d = os.path.join(_root(), tag)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


def stable_scratch(tag: str) -> str:
    """A session-stable directory (created once, reused) under the
    session root.  Use for build-once artifacts like the IVF index."""
    d = os.path.join(_root(), tag)
    os.makedirs(d, exist_ok=True)
    return d
