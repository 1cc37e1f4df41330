"""Remove-predecessor temp-dir tracking for operator keys that stage
files on local disk (ADVICE r05: time travel / WAP / tick-stream /
python-sink each mkdtemp'd per invocation and never cleaned up, so
multi-run benches, two-SF parity sweeps, and test sessions accumulated
unbounded garbage).

Contract: ``fresh_dirs(key, *prefixes)`` deletes the dirs the SAME key
created on its previous invocation, then hands back fresh ones. Deleting
on the NEXT call (not atexit-only) keeps the returned lazy DataFrames
readable until the caller has consumed them — the same lifecycle the
q_sink_python_ds_write `_LAST_SINK_DIR` fix established. An atexit hook
sweeps whatever the final invocation left behind.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_LAST: dict[str, list[str]] = {}


def fresh_dirs(key: str, *prefixes: str) -> list[str]:
    """Fresh mkdtemp dirs for ``key``, removing the key's previous set."""
    for d in _LAST.pop(key, []):
        shutil.rmtree(d, ignore_errors=True)
    dirs = [tempfile.mkdtemp(prefix=p) for p in prefixes]
    _LAST[key] = dirs
    return dirs


@atexit.register
def _sweep_remaining() -> None:  # pragma: no cover - process teardown
    for dirs in _LAST.values():
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    _LAST.clear()
