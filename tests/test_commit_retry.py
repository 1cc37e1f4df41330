"""Task-retry failure injection for the commit protocols (VERDICT r12
next-round #6): the jsonl sink's two-phase commit and write-audit-
publish must never expose a partial write, whether the failing task
eventually succeeds (retry) or exhausts maxFailures (job abort).

Runs tests/retry_injection_driver.py in a subprocess — local-mode task
retries require a ``local[N, maxFailures]`` master, which the shared
session fixture doesn't (and shouldn't) use."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

DRIVER = os.path.join(os.path.dirname(__file__), "retry_injection_driver.py")


@pytest.fixture(scope="module")
def verdict():
    proc = subprocess.run(
        [sys.executable, DRIVER],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    last = [line for line in proc.stdout.splitlines() if line.strip()][-1]
    return json.loads(last)


def test_sink_retry_commits_exactly_once(verdict):
    a = verdict["a"]
    assert a["manifest_rows"] == 10_000
    assert a["n_ids"] == a["n_unique"] == 10_000
    # the dead attempt's partial file is ON DISK but OUT of the manifest
    # — proof the injection fired AND the two-phase commit masked it
    assert a["stray_files"] >= 1


def test_wap_retry_publishes_complete_batch(verdict):
    b = verdict["b"]
    assert b["all_passed"] is True
    assert b["published_rows"] == b["n_cand"] == 20
    assert b["manifest_exists"] is True


def test_sink_exhausted_retries_publish_nothing(verdict):
    c = verdict["c"]
    assert c["raised"] is True
    assert c["manifest_published"] is False
