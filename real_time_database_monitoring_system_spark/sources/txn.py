"""Crash-atomic multi-table transactions over plain parquet.

The environment has no Delta/Iceberg (probe in NOTES.md), but their
commit protocol does not actually need a table format — it needs two
POSIX facts:

1. data files written into a NEW directory are invisible until
   something points at them, and
2. `os.replace` (rename(2) within a filesystem) is atomic: readers see
   either the old manifest or the new one, never a torn mix.

`SnapshotCatalog` is that protocol reduced to its core: every table
version is an immutable parquet directory under `data/<table>/v<n>/`;
the ONLY mutable object in the whole catalog is one `MANIFEST.json`
mapping table → current version directory. A multi-table commit writes
all its new version directories first (a crash here strands invisible
orphans, nothing else), then swaps the manifest once. Therefore a
process crash at ANY instant leaves readers with the complete old
snapshot of EVERY table or the complete new one — the all-or-nothing
guarantee the reference gets from PostgreSQL's WAL under
``transaction.atomic`` (/root/reference/myapp/views.py:102-119,
152-171), which `operators.mutation.multi_table_transaction`'s
rollback-on-error protocol alone cannot give across a crash.

Snapshot isolation falls out for free: old version directories are
never touched by a commit, so a reader that resolved its paths before
the swap keeps reading a consistent snapshot; `vacuum()` reclaims
directories no longer referenced by the current manifest (the
Delta/Iceberg VACUUM split between commit and cleanup).

At cluster scale the same shape holds with the manifest swap delegated
to a conditional PUT / compare-and-swap on the object store — the data
plane (immutable version directories) is unchanged; only the 100-byte
control-plane swap is storage-specific.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "MANIFEST.json"


class ConcurrentCommitError(RuntimeError):
    """A second writer attempted to commit while another commit holds
    the catalog's lock file."""


class SnapshotCatalog:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        if not os.path.exists(self._manifest_path):
            self._swap_manifest({"version": 0, "tables": {}})

    # -- control plane -------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def manifest(self) -> dict:
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def _swap_manifest(self, m: dict) -> None:
        # write-fsync-rename: the tmp file is fully durable BEFORE the
        # atomic rename publishes it, so a crash can't publish a torn
        # manifest (rename-before-fsync could)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".manifest.")
        try:
            with os.fdopen(fd, "w") as fh:
                json.dump(m, fh, indent=1)
                fh.flush()
                os.fsync(fh.fileno())
            # archive BEFORE publish: once MANIFEST.vN exists its
            # version is either the published current (swap succeeded)
            # or an unpublished orphan (harmless — time travel only
            # resolves versions ≤ the current manifest's)
            shutil.copyfile(tmp, self._manifest_path_v(m["version"]))
            os.replace(tmp, self._manifest_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def _manifest_path_v(self, version: int) -> str:
        return os.path.join(self.root, f"MANIFEST.v{version}.json")

    # -- data plane ----------------------------------------------------
    def _version_dir(self, table: str, version: int) -> str:
        return os.path.join(self.root, "data", table, f"v{version}")

    def read(
        self, spark: SparkSession, table: str, version: int | None = None
    ) -> DataFrame:
        """Read a table at the current snapshot, or TIME-TRAVEL to any
        earlier committed version (every commit archives its manifest
        as `MANIFEST.v<n>.json`) — the audit/debug/reproducibility
        surface of a table format ("which corpus did run X train on")
        for free, since version directories are immutable until
        `vacuum()`. Reading a vacuumed version fails at scan time, the
        same contract Delta's `versionAsOf` has after its VACUUM."""
        if version is None:
            m = self.manifest()
        else:
            current = self.manifest()["version"]
            if version > current:
                raise KeyError(
                    f"SnapshotCatalog: version {version} not committed "
                    f"(current is {current})"
                )
            with open(self._manifest_path_v(version)) as fh:
                m = json.load(fh)
        tables = m["tables"]
        if table not in tables:
            raise KeyError(
                f"SnapshotCatalog: unknown table {table!r}"
                + (f" at version {version}" if version is not None else "")
            )
        return spark.read.parquet(os.path.join(self.root, tables[table]))

    def commit(
        self, writes: dict[str, DataFrame], expected_version: int | None = None
    ) -> int:
        """All-or-nothing multi-table commit. Phase 1 writes every new
        version directory (all compute/IO failures happen here, while
        the manifest still points at the old snapshot — the debris is
        invisible and `vacuum()` reclaims it). Phase 2 is ONE atomic
        manifest swap covering every table.

        Writers serialize on an O_CREAT|O_EXCL lock file (the POSIX
        compare-and-swap): a second concurrent writer fails fast with
        `ConcurrentCommitError` instead of basing its version on a
        manifest another commit is about to replace — the lost-update
        interleaving an unguarded read-modify-swap would allow. A
        writer that CRASHES holding the lock leaves it behind; the
        error message names the lock so an operator (or an orchestrator
        timeout) can remove it — exactly Delta/Iceberg's abandoned-
        transaction story, minus their automatic expiry."""
        lock = os.path.join(self.root, ".commit.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"another commit holds {lock}; if its writer crashed, "
                "remove the lock file to recover"
            ) from None
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            m = self.manifest()
            # optimistic CAS for read-modify-write callers (merge_into):
            # the lock serializes the SWAP, but a transformation computed
            # from an older snapshot must not overwrite a commit it never
            # saw — the caller states which version its writes derive
            # from, and a mismatch fails instead of losing that update
            if expected_version is not None and m["version"] != expected_version:
                raise ConcurrentCommitError(
                    f"snapshot moved: writes derive from version "
                    f"{expected_version} but the catalog is at "
                    f"{m['version']}; re-read and retry"
                )
            version = m["version"] + 1
            new_tables = dict(m["tables"])
            written: list[str] = []
            try:
                for table, df in writes.items():
                    target = self._version_dir(table, version)
                    df.write.mode("errorifexists").parquet(target)
                    written.append(target)
                    new_tables[table] = os.path.relpath(target, self.root)
                self._swap_manifest({"version": version, "tables": new_tables})
            except BaseException:
                # a failed phase 1 must not BRICK the next attempt: the
                # retry recomputes the same version number, and
                # errorifexists would then reject it against this
                # attempt's debris forever (r12 review). Remove only
                # what THIS attempt wrote — a crash that skips this
                # cleanup still leaves invisible orphans for vacuum(),
                # which is the documented (weaker) fallback.
                for target in written:
                    shutil.rmtree(target, ignore_errors=True)
                raise
            return version
        finally:
            os.unlink(lock)

    def vacuum(self) -> list[str]:
        """Remove version directories not referenced by the CURRENT
        manifest (orphans from crashed commits and superseded
        versions). Serializes on the SAME `.commit.lock` as `commit`
        and re-reads the manifest UNDER it (r12 review): an unlocked
        vacuum that resolved the live set from a stale manifest could
        rmtree a concurrent commit's phase-1 directory — or, after the
        swap lands, the just-published CURRENT version. Raises
        `ConcurrentCommitError` if a commit is in flight (retry when
        it finishes), mirroring the commit-side contract."""
        lock = os.path.join(self.root, ".commit.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"a commit holds {lock}; vacuum after it finishes (or "
                "remove the lock file if its writer crashed)"
            ) from None
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            live = {
                os.path.normpath(rel)
                for rel in self.manifest()["tables"].values()
            }
            removed = []
            data = os.path.join(self.root, "data")
            for table in sorted(os.listdir(data)):
                tdir = os.path.join(data, table)
                for vdir in sorted(os.listdir(tdir)):
                    rel = os.path.normpath(os.path.join("data", table, vdir))
                    if rel not in live:
                        shutil.rmtree(os.path.join(tdir, vdir))
                        removed.append(rel)
            return removed
        finally:
            os.unlink(lock)


def merge_into(
    cat: SnapshotCatalog,
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """MERGE (upsert) into a catalog table as ONE crash-atomic commit
    — the Delta `MERGE INTO`/Iceberg `merge-on-read` user surface over
    the SnapshotCatalog protocol: read the current snapshot, apply the
    engine's last-writer-wins `operators.mutation.upsert`, commit the
    result as a new version. A crash anywhere leaves the old snapshot;
    readers never observe a half-merged table. Composes the existing
    pieces — no new merge semantics to re-verify. The read-modify-write
    is guarded by optimistic CAS: the commit carries the version the
    merge READ, so a commit that lands in between fails this merge
    with `ConcurrentCommitError` (re-read and retry) instead of being
    silently overwritten by a result that never saw it."""
    from ..operators.mutation import upsert

    base_version = cat.manifest()["version"]
    current = cat.read(spark, table)
    return cat.commit(
        {table: upsert(current, updates, key_cols)},
        expected_version=base_version,
    )
