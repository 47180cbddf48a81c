from __future__ import annotations

import fnmatch
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")

from real_time_database_monitoring_system_spark.session import get_local_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"

# Driver-artifact patterns the round-window rotation derives its check
# set from; an untracked one silently skews the next round's rotation
# (the r3–r9 manual ritual this guard finally automates).
_ARTIFACT_PATTERNS = ("CORRECTNESS_r*.json", "BENCH_r*.json", "BENCH_DETAIL_r*.json")


def stray_artifacts(untracked: list[str]) -> list[str]:
    """Driver artifacts among an untracked-file list (unit-testable
    core of the session-start guard)."""
    return [
        f
        for f in untracked
        if any(fnmatch.fnmatch(f, p) for p in _ARTIFACT_PATTERNS)
    ]


def pytest_sessionstart(session):
    """Fail the suite at collection time while any driver artifact
    (CORRECTNESS_r*/BENCH_r*/BENCH_DETAIL_r*.json) is untracked: the
    window rotation reads committed artifacts, so running tests on a
    tree that would ship without them is a round-close footgun.
    Override with SPARK_GRAFT_ALLOW_UNTRACKED=1 (driver/CI runs that
    legitimately produce artifacts mid-check)."""
    import os

    if os.environ.get("SPARK_GRAFT_ALLOW_UNTRACKED") == "1":
        return
    try:
        out = subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard"],
            cwd=str(session.config.rootpath),
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.splitlines()
    except Exception:
        return  # not a git checkout (e.g. exported tree) — nothing to guard
    stray = stray_artifacts(out)
    if stray:
        raise pytest.UsageError(
            "Untracked driver artifact(s) present — commit them before "
            f"running the suite (or set SPARK_GRAFT_ALLOW_UNTRACKED=1): {stray}"
        )


@pytest.fixture(scope="session")
def spark():
    s = get_local_spark(8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
