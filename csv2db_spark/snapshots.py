"""Snapshot-versioned parquet table (a minimal table format).

The plain parquet sinks in sink.py answer "what is the table now"; a
training-data pipeline also needs "what was the table when run X
trained" — reproducible dataset lineage. This module adds the smallest
table-format core that delivers it, following the published
Iceberg/Delta design arguments (manifest-listed immutable files; the
reference tool has no table versioning at all — its tables are whatever
the DBMS holds after the last load):

- **Immutable data files, manifest-listed.** Every commit writes its
  rows into a fresh ``data/c{N}/`` directory and publishes a JSON
  manifest ``_snapshots/v{N}.json`` naming the EXACT file list of the
  new version (append = parent's list + new files, overwrite = new
  files only). Readers never list directories — the manifest IS the
  table, so planning cost is O(manifest), not O(objects in the bucket),
  the core scale argument for manifests over directory listing.
- **Atomic, optimistic commits.** The manifest is created with
  O_CREAT|O_EXCL after its data files are fully written: a version
  either exists completely or not at all. Two racing writers targeting
  the same next version — the classic last-writer-wins corruption in
  directory-based tables — make one winner and one clean
  ``SnapshotConflict``; the loser retries against the new head.
  A crash between data write and manifest publish leaves orphan files
  that no manifest references: invisible to every reader, reclaimable
  by comparing ``data/`` against the union of manifests.
- **Time travel.** ``read(version=...)`` plans from that version's
  manifest; ``read()`` resolves the head. Snapshot isolation falls
  out: a reader planning from v3 is untouched by a concurrent commit
  of v4 (v3's files are immutable).

At 100 TB the data files are whatever partitioned/sorted layout the
writer chose — this layer only versions WHICH files are in the table,
adding one small JSON per commit; reads remain ordinary pruned parquet
scans over the listed files.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another writer published this version first — reread the head."""


class NoSuchVersion(KeyError):
    pass


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        (self.path / "_snapshots").mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ manifests

    def versions(self) -> list[int]:
        snaps = self.path / "_snapshots"
        return sorted(
            int(p.stem[1:]) for p in snaps.glob("v*.json")
        )

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        p = self.path / "_snapshots" / f"v{version}.json"
        try:
            with open(p) as fh:
                return json.load(fh)
        except OSError as exc:
            raise NoSuchVersion(version) from exc

    def _publish(self, version: int, op: str, files: list[str]) -> None:
        """Create the manifest atomically and exclusively: the version is
        visible only with its complete file list, and a racing writer of
        the same version loses with SnapshotConflict instead of
        overwriting."""
        p = self.path / "_snapshots" / f"v{version}.json"
        body = json.dumps(
            {"version": version, "op": op, "files": sorted(files)}, indent=1
        )
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise SnapshotConflict(
                f"version {version} already published at {p}"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            fh.write(body)

    # -------------------------------------------------------------- commits

    def _write_commit_files(self, df: DataFrame, version: int) -> list[str]:
        cdir = self.path / "data" / f"c{version}"
        df.write.mode("overwrite").parquet(str(cdir))
        return [
            f"data/c{version}/{name}"
            for name in os.listdir(cdir)
            if name.endswith(".parquet")
        ]

    def create(self, df: DataFrame) -> int:
        if self.current_version() is not None:
            raise SnapshotConflict(f"table at {self.path} already exists")
        files = self._write_commit_files(df, 1)
        self._publish(1, "create", files)
        return 1

    def append(self, df: DataFrame) -> int:
        head = self.current_version()
        if head is None:
            return self.create(df)
        nxt = head + 1
        files = self._write_commit_files(df, nxt)
        self._publish(nxt, "append", self._manifest(head)["files"] + files)
        return nxt

    def overwrite(self, df: DataFrame) -> int:
        head = self.current_version()
        nxt = (head or 0) + 1
        files = self._write_commit_files(df, nxt)
        self._publish(nxt, "overwrite", files)
        return nxt

    # ---------------------------------------------------------------- reads

    def read(self, version: int | None = None) -> DataFrame:
        if version is None:
            version = self.current_version()
            if version is None:
                raise NoSuchVersion("empty table")
        files = self._manifest(version)["files"]
        return self.spark.read.parquet(*[str(self.path / f) for f in files])

    def history(self) -> list[dict]:
        return [
            {
                "version": v,
                "op": self._manifest(v)["op"],
                "n_files": len(self._manifest(v)["files"]),
            }
            for v in self.versions()
        ]

    def orphan_files(self) -> list[str]:
        """Data files no manifest references (crashed commits) — safe to
        reclaim because visibility requires a manifest entry."""
        live: set[str] = set()
        for v in self.versions():
            live.update(self._manifest(v)["files"])
        found = []
        droot = self.path / "data"
        for cdir in sorted(droot.glob("c*")):
            for name in sorted(os.listdir(cdir)):
                rel = f"data/{cdir.name}/{name}"
                if name.endswith(".parquet") and rel not in live:
                    found.append(rel)
        return found

    # ------------------------------------------------------------ increments

    def added_files(self, from_version: int, to_version: int) -> list[str]:
        base = set(self._manifest(from_version)["files"])
        return [f for f in self._manifest(to_version)["files"] if f not in base]

    def removed_files(self, from_version: int, to_version: int) -> list[str]:
        now = set(self._manifest(to_version)["files"])
        return [f for f in self._manifest(from_version)["files"] if f not in now]

    def incremental_read(self, from_version: int, to_version: int) -> DataFrame:
        """Rows in files ADDED between two versions — the incremental
        feed a training pipeline tails instead of re-reading the table
        (run N processes changes since run N-1's pinned version). Because
        data files are immutable, the file-list diff IS the row diff for
        append-only history: cost is O(changed data), never O(table).
        After an overwrite, pair with ``removed_files`` (rows in those
        files left the table) — the file-granularity contract every
        manifest-based format exposes. Returns an empty frame of the
        table's schema when nothing was added."""
        files = self.added_files(from_version, to_version)
        if not files:
            return self.read(to_version).limit(0)
        return self.spark.read.parquet(*[str(self.path / f) for f in files])

    def rollback(self, version: int) -> int:
        """Publish the head's successor with an OLD version's exact file
        list — undo as a forward commit (history is append-only; nothing
        is deleted, so audits and pinned readers keep working)."""
        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        nxt = head + 1
        self._publish(nxt, f"rollback:{version}", self._manifest(version)["files"])
        return nxt

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Reclaim storage: drop manifests older than the last
        ``retain_last`` versions, then delete data files referenced by
        NO surviving manifest (orphans included). Time travel keeps
        working for every retained version — this trades history depth
        for space, the same dial every table format exposes. Returns
        the deleted file list. Deletion order is safe under crash:
        manifests go first, so a file is only ever removed after no
        reader can plan it."""
        import shutil as _shutil

        vs = self.versions()
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        doomed_vs = vs[:-retain_last] if len(vs) > retain_last else []
        for v in doomed_vs:
            os.remove(self.path / "_snapshots" / f"v{v}.json")
        live: set[str] = set()
        for v in self.versions():
            live.update(self._manifest(v)["files"])
        deleted = []
        droot = self.path / "data"
        for cdir in sorted(droot.glob("c*")) if droot.is_dir() else []:
            names = sorted(os.listdir(cdir))
            doomed = [
                n
                for n in names
                if n.endswith(".parquet") and f"data/{cdir.name}/{n}" not in live
            ]
            for name in doomed:
                os.remove(cdir / name)
                deleted.append(f"data/{cdir.name}/{name}")
            # a commit dir with no surviving data files goes entirely
            # (write-time sidecars like _SUCCESS ride along)
            if not any(
                f"data/{cdir.name}/{n}" in live
                for n in names
                if n.endswith(".parquet")
            ):
                _shutil.rmtree(cdir, ignore_errors=True)
        return deleted

    # ----------------------------------------------- copy-on-write / WAP

    def _files_hit(self, files: list[str], hit_paths: set[str]) -> list[str]:
        """Map ``input_file_name()`` URIs (file:/... or bare paths,
        engine-dependent) back to the manifest's relative file names."""
        abs_of = {f: str((self.path / f).resolve()) for f in files}

        def _is_hit(rel: str) -> bool:
            a = abs_of[rel]
            return any(h.endswith(a) or a in h for h in hit_paths)

        return [f for f in files if _is_hit(f)]

    def delete_where(self, condition) -> int:
        """Copy-on-write row deletion: locate the files that actually
        hold matching rows (one pushdown-filtered scan over the head
        version), rewrite ONLY those files without the doomed rows into
        a fresh commit dir, and publish a manifest of untouched files +
        rewrites. Untouched files are never read twice, never copied;
        the commit is the same atomic O_EXCL publish as every other
        write, so there is no backup/restore dance and no window where
        a reader can see a half-deleted table (the failure mode the
        directory-swap delete in sink.targeted_delete needs its staged
        manifest to recover from — here crash recovery is "the new
        version simply never appeared"). At 100 TB the locate scan is
        the pushed predicate over column statistics (pair with the
        bloom manifest in sources/skipping for point-delete keys);
        rewrite cost is O(affected files)."""
        from pyspark.sql import functions as F

        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        files = self._manifest(head)["files"]
        hit_paths = {
            r[0]
            for r in self.read(head)
            .where(condition)
            .select(F.input_file_name())
            .distinct()
            .collect()  # bounded by |files in the version|, never rows
        }
        affected = self._files_hit(files, hit_paths)
        kept = [f for f in files if f not in set(affected)]
        nxt = head + 1
        new_files: list[str] = []
        if affected:
            # delete rows where the predicate is TRUE; NULL keeps the row
            # (SQL DELETE semantics — a bare ~condition would silently
            # drop NULL-evaluating rows from rewritten files)
            survivors = self.spark.read.parquet(
                *[str(self.path / f) for f in affected]
            ).where(~F.coalesce(condition, F.lit(False)))
            new_files = self._write_commit_files(survivors, nxt)
        self._publish(nxt, "delete", kept + new_files)
        return nxt

    def merge_into(self, source: DataFrame, on: list[str] | str) -> int:
        """Copy-on-write MERGE: ``WHEN MATCHED THEN UPDATE SET * WHEN NOT
        MATCHED THEN INSERT *``. The source must carry the table's full
        schema; ``on`` names the join key column(s) and source keys must
        be unique (each matched target row is replaced by its single
        source row — the same multi-match restriction ANSI MERGE
        enforces with an error).

        Plan shape for 100 TB: one broadcast-semi probe of the head
        version against the source's distinct keys finds the files that
        hold matched rows (the delta is small next to the table, so the
        probe is a broadcast join under the pushed scan — never a fact
        shuffle); only those files are rewritten (their unmatched rows
        anti-joined out of the delta, then the whole source unioned in —
        matched rows land as updates, unmatched source rows as inserts,
        one write). Every untouched file is referenced verbatim by the
        new manifest, and the publish is the same atomic O_EXCL commit:
        a crash mid-merge leaves only invisible orphans."""
        from pyspark.sql import functions as F

        keys = [on] if isinstance(on, str) else list(on)
        head = self.current_version()
        if head is None:
            return self.create(source)
        files = self._manifest(head)["files"]
        key_df = source.select(*keys).distinct()
        hit_paths = {
            r[0]
            # input_file_name() must bind to the scan BEFORE the join
            # (it has no single source above a two-table plan)
            for r in self.read(head)
            .withColumn("_src_file", F.input_file_name())
            .join(F.broadcast(key_df), keys, "left_semi")
            .select("_src_file")
            .distinct()
            .collect()  # bounded by |files|, never rows
        }
        affected = self._files_hit(files, hit_paths)
        kept = [f for f in files if f not in set(affected)]
        nxt = head + 1
        if affected:
            survivors = self.spark.read.parquet(
                *[str(self.path / f) for f in affected]
            ).join(F.broadcast(key_df), keys, "left_anti")
            new_data = survivors.unionByName(source)
        else:
            new_data = source  # pure insert: nothing matched anywhere
        new_files = self._write_commit_files(new_data, nxt)
        self._publish(nxt, "merge", kept + new_files)
        return nxt

    def compact(self, target_files: int = 1) -> int:
        """Rewrite the head version's row set into ``target_files``
        files as a new commit — the maintenance op that undoes
        small-file buildup from many incremental appends/merges. Row
        set is bit-identical (pure coalesce, no shuffle); history is
        untouched, so pinned readers of old versions keep their exact
        file lists and ``vacuum`` reclaims the fragmented originals
        once they age out of retention."""
        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        nxt = head + 1
        new_files = self._write_commit_files(
            self.read(head).coalesce(target_files), nxt
        )
        self._publish(nxt, "compact", new_files)
        return nxt

    def write_audit_publish(self, df: DataFrame, rules, op: str = "append"):
        """The WAP pattern: stage the commit's data files, AUDIT the
        staged rows with operators/quality.check_constraints, and only
        then publish the manifest. A failing audit publishes NOTHING —
        the staged files are unreferenced orphans (invisible to every
        reader, reclaimed by vacuum), so bad data can never reach a
        consumer even transiently. Returns (version_or_None, report_df);
        version is None iff the audit failed. ``op`` is "append" or
        "overwrite"."""
        from csv2db_spark.operators.quality import check_constraints

        head = self.current_version()
        nxt = (head or 0) + 1
        files = self._write_commit_files(df, nxt)
        staged = self.spark.read.parquet(*[str(self.path / f) for f in files])
        report = staged.sparkSession.createDataFrame(
            check_constraints(staged, rules).collect(),
            "rule string, n_rows long, n_violations long, passed boolean",
        )
        if report.where(~report.passed).count() > 0:
            return None, report
        if op == "append" and head is not None:
            files = self._manifest(head)["files"] + files
        elif op not in ("append", "overwrite"):
            raise ValueError(f"unsupported op {op!r}")
        self._publish(nxt, f"wap-{op}", files)
        return nxt, report
