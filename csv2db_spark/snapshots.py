"""Snapshot-versioned parquet table (a minimal table format).

The plain parquet sinks in sink.py answer "what is the table now"; a
training-data pipeline also needs "what was the table when run X
trained" — reproducible dataset lineage. This module adds the smallest
table-format core that delivers it, following the published
Iceberg/Delta design arguments (manifest-listed immutable files; the
reference tool has no table versioning at all — its tables are whatever
the DBMS holds after the last load):

- **Immutable data files, manifest-listed.** Every commit writes its
  rows into a fresh writer-unique ``data/c{N}-{uuid}/`` directory and
  publishes a JSON manifest ``_snapshots/v{N}.json`` naming the EXACT file list of the
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
- **Schema evolution.** Every manifest records its version's
  [[column, type]] schema; reads reconcile each file to it by name
  (missing column → NULL, dropped column → projected away), so
  add/drop column is a metadata commit (``alter_add_column`` /
  ``alter_drop_column`` or just an ``append`` with more columns) —
  never a table rewrite. Type changes on append are refused
  (SchemaConflict) rather than silently coerced.

At 100 TB the data files are whatever partitioned/sorted layout the
writer chose — this layer only versions WHICH files are in the table,
adding one small JSON per commit; reads remain ordinary pruned parquet
scans over the listed files.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another writer published this version first — reread the head."""


class SchemaConflict(TypeError):
    """An append changed an existing column's TYPE — that's a rewrite
    (or a cast in the writer), never silent coercion at read time."""


class NoSuchVersion(KeyError):
    pass


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        stats_cols: list[str] | None = None,
        clock=None,
    ):
        """``stats_cols`` opts files into per-file [min, max, null_count]
        statistics, computed once per commit over ONLY that commit's new
        files and carried forward in the manifest — the Iceberg design:
        planning reads the manifest, never the data. Columns should be
        numeric or string (values must order the same way under JSON
        round-trip as in the engine).

        ``clock`` (``() -> float``, default ``time.time``) stamps each
        manifest's ``committed_at`` — the basis for timestamp time
        travel (``read_as_of``). Injectable so tests and gates commit
        under a deterministic clock."""
        import time as _time

        self.spark = spark
        self.path = Path(path)
        self.stats_cols = list(stats_cols or [])
        self._clock = clock or _time.time
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

    def _publish(
        self,
        version: int,
        op: str,
        files: list[str],
        stats: dict | None = None,
        schema: list[list[str]] | None = None,
    ) -> None:
        """Create the manifest atomically and exclusively: the version is
        visible only with its complete file list, and a racing writer of
        the same version loses with SnapshotConflict instead of
        overwriting. ``schema`` is the version's committed [[name, ddl]]
        column list (Iceberg records schemas per snapshot the same way);
        readers reconcile every listed file to it, so column add/drop is
        a manifest edit, never a data rewrite."""
        p = self.path / "_snapshots" / f"v{version}.json"
        body_dict = {
            "version": version,
            "op": op,
            "committed_at": float(self._clock()),
            "files": sorted(files),
            "stats": stats or {},
        }
        if schema is not None:
            body_dict["schema"] = schema
        body = json.dumps(
            body_dict,
            indent=1,
            default=str,
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
        """Stage a commit's data under a WRITER-UNIQUE directory.

        The version number is only unique in the MANIFEST name (that's
        what the O_EXCL publish arbitrates); two racing writers both
        compute nxt = head + 1, so a version-keyed staging dir would be
        shared — the second writer's mode('overwrite') deletes the
        first's part files, and the publish winner could reference files
        the loser just destroyed (a permanently broken version). The
        uuid suffix makes staging collision-free: the loser's files
        become unreferenced orphans, reclaimed by vacuum()."""
        import uuid

        cname = f"c{version}-{uuid.uuid4().hex[:12]}"
        cdir = self.path / "data" / cname
        df.write.mode("error").parquet(str(cdir))
        return [
            f"data/{cname}/{name}"
            for name in os.listdir(cdir)
            if name.endswith(".parquet")
        ]

    @staticmethod
    def _schema_of(df: DataFrame) -> list[list[str]]:
        return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]

    def _schema_at(self, version: int | None) -> list[list[str]] | None:
        if version is None:
            return None
        return self._manifest(version).get("schema")

    def _evolved_schema(
        self, head: int | None, df: DataFrame
    ) -> list[list[str]]:
        """The schema an append commits: the parent's columns in their
        existing order (a writer may omit any of them — readers NULL-fill
        from the manifest), plus the append's genuinely new columns at
        the end (add-column evolution). A same-name type change raises
        SchemaConflict — silent coercion is how directory-based tables
        corrupt; an intentional retype is an ``overwrite``."""
        new = self._schema_of(df)
        old = self._schema_at(head)
        if old is None:
            return new
        new_by_name = dict((n, t) for n, t in new)
        for n, t in old:
            if n in new_by_name and new_by_name[n] != t:
                raise SchemaConflict(
                    f"column {n!r}: table has {t}, append has {new_by_name[n]}"
                )
        old_names = {n for n, _ in old}
        return [list(c) for c in old] + [
            [n, t] for n, t in new if n not in old_names
        ]

    def _read_files(
        self, files: list[str], schema: list[list[str]] | None = None
    ) -> DataFrame:
        """Plan a scan over exactly ``files``, reconciled to the
        manifest ``schema`` when one is recorded: files written before a
        column existed yield NULL for it, files carrying since-dropped
        columns lose them at the projection, and the column ORDER is the
        manifest's regardless of file layout — reconcile-by-name at the
        table-format level (the same rule ingest.reconcile applies at
        the CSV level). Without a recorded schema this is a plain read."""
        paths = [str(self.path / f) for f in files]
        if not schema:
            return self.spark.read.parquet(*paths)
        from pyspark.sql import functions as F

        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        present = set(df.columns)
        return df.select(
            *[
                (F.col(n).cast(t) if n in present else F.lit(None).cast(t)).alias(n)
                for n, t in schema
            ]
        )

    def _stats_of(self, files: list[str]) -> dict:
        """Per-file [min, max, null_count] for ``stats_cols``, computed
        with ONE scan of exactly the given files (map-side aggregate
        within each file's own split — incremental maintenance, never a
        table rescan). Empty when the table has no stats columns."""
        if not self.stats_cols or not files:
            return {}
        from pyspark.sql import functions as F

        aggs = []
        for c in self.stats_cols:
            aggs += [
                F.min(c).alias(f"{c}__min"),
                F.max(c).alias(f"{c}__max"),
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            ]
        rows = (
            self.spark.read.parquet(*[str(self.path / f) for f in files])
            .withColumn("_f", F.input_file_name())
            .groupBy("_f")
            .agg(*aggs)
            .collect()
        )
        rel_of = {
            str((self.path / f).resolve()): f for f in files
        }
        out: dict = {}
        for r in rows:
            rel = rel_of.get(self._uri_to_path(r["_f"]))
            if rel is None:  # pragma: no cover - defensive
                continue
            out[rel] = {
                c: [r[f"{c}__min"], r[f"{c}__max"], r[f"{c}__nulls"]]
                for c in self.stats_cols
            }
        return out

    def _carry_stats(
        self, parent: int | None, kept: list[str], new_files: list[str]
    ) -> dict:
        """New manifest's stats: parent entries for carried-over files
        (no recompute — files are immutable) + one scan over the fresh
        files."""
        if not self.stats_cols:
            return {}
        parent_stats = self._manifest(parent).get("stats", {}) if parent else {}
        out = {f: parent_stats[f] for f in kept if f in parent_stats}
        out.update(self._stats_of(new_files))
        return out

    def create(self, df: DataFrame) -> int:
        if self.current_version() is not None:
            raise SnapshotConflict(f"table at {self.path} already exists")
        files = self._write_commit_files(df, 1)
        self._publish(
            1, "create", files, self._stats_of(files), self._schema_of(df)
        )
        return 1

    def append(self, df: DataFrame) -> int:
        head = self.current_version()
        if head is None:
            return self.create(df)
        nxt = head + 1
        schema = self._evolved_schema(head, df)  # conflict check BEFORE write
        files = self._write_commit_files(df, nxt)
        old = self._manifest(head)["files"]
        self._publish(
            nxt,
            "append",
            old + files,
            self._carry_stats(head, old, files),
            schema,
        )
        return nxt

    def overwrite(self, df: DataFrame) -> int:
        head = self.current_version()
        nxt = (head or 0) + 1
        files = self._write_commit_files(df, nxt)
        self._publish(
            nxt, "overwrite", files, self._stats_of(files), self._schema_of(df)
        )
        return nxt

    # ---------------------------------------------------------------- reads

    def read(self, version: int | None = None) -> DataFrame:
        if version is None:
            version = self.current_version()
            if version is None:
                raise NoSuchVersion("empty table")
        m = self._manifest(version)
        return self._read_files(m["files"], m.get("schema"))

    def version_as_of(self, ts: float) -> int:
        """Latest version whose ``committed_at`` <= ``ts`` — Iceberg's
        ``FOR TIMESTAMP AS OF`` resolution. Manifests published before
        this field existed sort as -inf (always visible). O(manifests),
        never touches data."""
        best = None
        for v in self.versions():
            at = self._manifest(v).get("committed_at", float("-inf"))
            if at <= ts:
                best = v
        if best is None:
            raise NoSuchVersion(f"no version committed at or before {ts}")
        return best

    def read_as_of(self, ts: float) -> DataFrame:
        """Timestamp time travel: the table exactly as it stood at
        ``ts`` (the complement of version-addressed ``read``)."""
        return self.read(self.version_as_of(ts))

    def history(self) -> list[dict]:
        return [
            {
                "version": v,
                "op": self._manifest(v)["op"],
                "committed_at": self._manifest(v).get("committed_at"),
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
        return self._read_files(files, self._schema_at(to_version))

    def rollback(self, version: int) -> int:
        """Publish the head's successor with an OLD version's exact file
        list — undo as a forward commit (history is append-only; nothing
        is deleted, so audits and pinned readers keep working)."""
        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        nxt = head + 1
        m = self._manifest(version)
        self._publish(
            nxt,
            f"rollback:{version}",
            m["files"],
            m.get("stats", {}),
            m.get("schema"),
        )
        return nxt

    def vacuum(
        self, retain_last: int = 1, orphan_grace_seconds: float = 900.0
    ) -> list[str]:
        """Reclaim storage: drop manifests older than the last
        ``retain_last`` versions, then delete data files referenced by
        NO surviving manifest (orphans included). Time travel keeps
        working for every retained version — this trades history depth
        for space, the same dial every table format exposes. Returns
        the deleted file list. Deletion order is safe under crash:
        manifests go first, so a file is only ever removed after no
        reader can plan it.

        Unreferenced files younger than ``orphan_grace_seconds`` are
        KEPT: a writer stages files under a unique ``data/c{N}-{uuid}``
        dir *before* its O_EXCL manifest publish, so a vacuum racing an
        in-flight commit would otherwise delete the staged files as
        orphans and the subsequent publish would create a permanently
        broken version. The grace window (same discipline as Iceberg's
        ``remove_orphan_files`` retention interval) makes vacuum safe to
        run alongside live writers; pass ``0`` only when no writer can
        be in flight."""
        import shutil as _shutil

        vs = self.versions()
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        doomed_vs = vs[:-retain_last] if len(vs) > retain_last else []
        # Carry exactly-once batch markers OUT of the doomed manifests
        # BEFORE deleting them: append_stream_batch / merge_stream_batch
        # rely on `stream-append:{id}` / `stream-merge:{id}` op strings
        # for replay protection, and a vacuum between a sink write and a
        # foreachBatch replay would otherwise silently re-apply the
        # batch (double rows / re-merged upserts).
        aged_markers = {
            op
            for v in doomed_vs
            if (op := self._manifest(v)["op"]).startswith(
                ("stream-append:", "stream-merge:")
            )
        }
        if aged_markers:
            self._save_stream_markers(self._stream_markers() | aged_markers)
        for v in doomed_vs:
            os.remove(self.path / "_snapshots" / f"v{v}.json")
        live: set[str] = set()
        for v in self.versions():
            live.update(self._manifest(v)["files"])
        deleted = []
        cutoff = time.time() - max(0.0, orphan_grace_seconds)
        droot = self.path / "data"
        for cdir in sorted(droot.glob("c*")) if droot.is_dir() else []:
            names = sorted(os.listdir(cdir))
            doomed = []
            in_grace = False
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                if f"data/{cdir.name}/{n}" in live:
                    continue
                try:
                    if (cdir / n).stat().st_mtime > cutoff:
                        in_grace = True  # possible in-flight writer
                        continue
                except OSError:
                    continue  # raced with another vacuum; nothing to do
                doomed.append(n)
            for name in doomed:
                os.remove(cdir / name)
                deleted.append(f"data/{cdir.name}/{name}")
            # a commit dir with no surviving data files goes entirely
            # (write-time sidecars like _SUCCESS ride along) — unless it
            # holds grace-protected files or is itself young enough to
            # be an in-flight writer's staging dir mid-population
            try:
                dir_young = cdir.stat().st_mtime > cutoff
            except OSError:
                continue
            if (
                not in_grace
                and not dir_young
                and not any(
                    f"data/{cdir.name}/{n}" in live
                    for n in names
                    if n.endswith(".parquet")
                )
            ):
                _shutil.rmtree(cdir, ignore_errors=True)
        return deleted

    # ------------------------------------------- exactly-once batch markers

    def _stream_markers(self) -> set[str]:
        """Batch markers carried forward by vacuum() after their
        manifests aged out of retention (``_snapshots/
        stream_markers.json``) — the durable half of the replay guard."""
        p = self.path / "_snapshots" / "stream_markers.json"
        try:
            with open(p) as fh:
                return set(json.load(fh))
        except OSError:
            return set()

    def _save_stream_markers(self, markers: set[str]) -> None:
        p = self.path / "_snapshots" / "stream_markers.json"
        tmp = p.with_suffix(".json.tmp")
        with open(tmp, "w") as fh:
            json.dump(sorted(markers), fh)
        os.replace(tmp, p)  # atomic swap: never a torn marker file

    def _batch_applied(self, marker: str) -> bool:
        """Replay check for foreachBatch sinks: a batch is applied iff
        its marker is in a LIVE manifest op OR in the marker file that
        vacuum() folds aged-out markers into."""
        return marker in self._stream_markers() or any(
            self._manifest(v)["op"] == marker for v in self.versions()
        )

    # ----------------------------------------------- copy-on-write / WAP

    @staticmethod
    def _uri_to_path(uri: str) -> str:
        """Normalize an ``input_file_name()`` value to a plain filesystem
        path. Spark returns PERCENT-ENCODED ``file:`` URIs — a table path
        containing a space (``%20``) or other encoded character would
        never match the raw resolved path, so endswith/substring matching
        silently classifies affected files as untouched (deleted rows
        survive, merged keys duplicate). Decode first, compare exact."""
        from urllib.parse import unquote, urlparse

        if "://" in uri or uri.startswith("file:"):
            return unquote(urlparse(uri).path)
        return unquote(uri)

    def _files_hit(self, files: list[str], hit_paths: set[str]) -> list[str]:
        """Map ``input_file_name()`` URIs (file:/... or bare paths,
        engine-dependent) back to the manifest's relative file names by
        EXACT decoded-path comparison (see ``_uri_to_path``)."""
        hits = {self._uri_to_path(h) for h in hit_paths}
        return [
            f for f in files if str((self.path / f).resolve()) in hits
        ]

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
            # drop NULL-evaluating rows from rewritten files); the
            # rewrite reconciles to the head schema so a predicate on an
            # evolved column binds even over pre-evolution files
            survivors = self._read_files(
                affected, self._schema_at(head)
            ).where(~F.coalesce(condition, F.lit(False)))
            new_files = self._write_commit_files(survivors, nxt)
        self._publish(
            nxt,
            "delete",
            kept + new_files,
            self._carry_stats(head, kept, new_files),
            self._schema_at(head),
        )
        return nxt

    def merge_into(
        self,
        source: DataFrame,
        on: list[str] | str,
        version_col: str | None = None,
    ) -> int:
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
        a crash mid-merge leaves only invisible orphans.

        ``version_col`` makes the merge RECENCY-CONDITIONED: a matched
        target row is replaced only when the source row's version is
        newer (NULL target version always loses; ties prefer the
        source). Without it, matched rows are updated unconditionally —
        correct for a full-refresh delta, but order-DEPENDENT when the
        deltas are micro-batches of a change stream: per-batch
        latest-wins + unconditional update equals a global max_by only
        if batches happen to arrive in version order. With it, the
        final table state is invariant under ANY split or ordering of
        the deltas (each key keeps its globally newest row), which is
        what makes ``merge_stream_batch`` deterministic under Spark's
        undefined micro-batch file grouping."""
        return self._merge_commit(source, on, "merge", version_col)

    def _merge_commit(
        self,
        source: DataFrame,
        on: list[str] | str,
        op: str,
        version_col: str | None = None,
    ) -> int:
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
        if affected and version_col is not None:
            # recency-conditioned: union target rows from affected files
            # with the delta and keep, per key, the newest row (NULL
            # version sorts last so seed rows always lose to real
            # changes; version ties prefer the source). One per-key
            # shuffle over O(delta + affected files) rows — never the
            # table. Unmatched target rows in affected files are their
            # key's only row and survive trivially.
            from pyspark.sql import Window

            tagged = (
                self._read_files(affected, self._schema_at(head))
                .withColumn("_is_src", F.lit(0))
                .unionByName(source.withColumn("_is_src", F.lit(1)))
            )
            w = Window.partitionBy(*keys).orderBy(
                F.col(version_col).desc_nulls_last(), F.col("_is_src").desc()
            )
            new_data = (
                tagged.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_rn", "_is_src")
            )
        elif affected:
            survivors = self._read_files(
                affected, self._schema_at(head)
            ).join(F.broadcast(key_df), keys, "left_anti")
            new_data = survivors.unionByName(source)
        else:
            new_data = source  # pure insert: nothing matched anywhere
        new_files = self._write_commit_files(new_data, nxt)
        self._publish(
            nxt,
            op,
            kept + new_files,
            self._carry_stats(head, kept, new_files),
            self._schema_at(head),
        )
        return nxt

    def merge_stream_batch(
        self,
        source: DataFrame,
        batch_id: int,
        on: list[str] | str,
        version_col: str | None = None,
    ) -> int | None:
        """Exactly-once MERGE for a foreachBatch CDC sink: the same
        copy-on-write upsert as ``merge_into``, with the micro-batch id
        committed inside the manifest op string — one atomic publish
        carries both the merged data and the "was this batch applied"
        marker, exactly like ``append_stream_batch``. A replayed batch
        (foreachBatch is at-least-once) finds its marker and returns
        None instead of double-applying — which for a merge would not
        just duplicate rows but RE-update matched ones, silently
        corrupting latest-wins semantics. This is the streaming face of
        CDC-into-lakehouse: each micro-batch of upserts costs O(delta +
        affected files), never a table rewrite.

        Pass ``version_col`` (the change-ordering column, e.g. the CDC
        log offset) whenever the stream's key order is not guaranteed
        to match micro-batch order — i.e. always, in practice: Spark
        groups source files into batches by listing order, so without
        the recency condition an early-keyed change landing in a late
        batch would clobber a newer value. With it the table equals the
        stream's global latest-wins reduction under ANY batch split
        (regression-pinned by the adversarial maxFilesPerTrigger=1
        test in tests/test_streaming_ingest.py)."""
        marker = f"stream-merge:{batch_id}"
        if self._batch_applied(marker):
            return None
        if self.current_version() is None:
            # first batch bootstraps the table — the marker must still
            # land in the op, or its replay would re-merge over the data
            files = self._write_commit_files(source, 1)
            self._publish(
                1, marker, files, self._stats_of(files), self._schema_of(source)
            )
            return 1
        return self._merge_commit(source, on, marker, version_col)

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
        self._publish(
            nxt,
            "compact",
            new_files,
            self._stats_of(new_files),
            self._schema_at(head),
        )
        return nxt

    # ------------------------------------------- stats-pruned planning

    def _classify_range(
        self, version: int, col: str, lo, hi
    ) -> tuple[list[str], list[str], list[str]]:
        """Split a version's files against ``col BETWEEN lo AND hi``
        using manifest stats only: (disjoint — provably no matching
        row; full — provably EVERY row matches; overlap — must be
        read). Files without stats land in overlap (pruning must be
        conservative). A file whose min is NULL holds no non-null
        values, so no row can satisfy a range predicate — disjoint."""
        stats = self._manifest(version).get("stats", {})
        disjoint: list[str] = []
        full: list[str] = []
        overlap: list[str] = []
        for f in self._manifest(version)["files"]:
            st = stats.get(f, {}).get(col)
            if st is None:
                overlap.append(f)
                continue
            mn, mx, nulls = st
            if mn is None or mx < lo or mn > hi:
                disjoint.append(f)
            elif mn >= lo and mx <= hi and not nulls:
                full.append(f)
            else:
                overlap.append(f)
        return disjoint, full, overlap

    def read_where(self, col: str, lo, hi, version: int | None = None) -> DataFrame:
        """Range read planned from manifest statistics: files whose
        [min, max] cannot intersect [lo, hi] are never opened (not even
        their footers — the per-file tax that dominates selective scans
        over millions of files); survivors get the exact predicate on
        top, so pruning is invisible to results. Requires ``col`` in
        ``stats_cols`` for pruning to bite; without stats every file
        conservatively survives."""
        from pyspark.sql import functions as F

        if version is None:
            version = self.current_version()
            if version is None:
                raise NoSuchVersion("empty table")
        _, full, overlap = self._classify_range(version, col, lo, hi)
        keep = full + overlap
        if not keep:
            return self.read(version).where(F.lit(False))
        return self._read_files(keep, self._schema_at(version)).where(
            F.col(col).between(F.lit(lo), F.lit(hi))
        )

    def delete_range(self, col: str, lo, hi) -> int:
        """DELETE WHERE col BETWEEN lo AND hi, planned from manifest
        stats: files wholly inside the range (and null-free) are
        dropped METADATA-ONLY — no read, no rewrite, just absent from
        the new manifest; files provably disjoint are referenced
        verbatim — never opened; only genuinely straddling files get
        the copy-on-write rewrite. This is the Iceberg "metadata
        delete": against a range-partitioned layout (write_sorted_
        parquet) dropping a retention window touches ~2 boundary files
        regardless of table size. Falls back to delete_where when the
        column has no stats."""
        from pyspark.sql import functions as F

        cond = F.col(col).between(F.lit(lo), F.lit(hi))
        if col not in self.stats_cols:
            return self.delete_where(cond)
        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        disjoint, full, overlap = self._classify_range(head, col, lo, hi)
        nxt = head + 1
        new_files: list[str] = []
        if overlap:
            survivors = self._read_files(
                overlap, self._schema_at(head)
            ).where(~F.coalesce(cond, F.lit(False)))
            new_files = self._write_commit_files(survivors, nxt)
        self._publish(
            nxt,
            f"delete-range(meta:{len(full)},rewrite:{len(overlap)})",
            disjoint + new_files,
            self._carry_stats(head, disjoint, new_files),
            self._schema_at(head),
        )
        return nxt

    def commit_with_retry(self, op, retries: int = 5):
        """Optimistic-concurrency driver loop: run ``op(table)`` (any
        commit method — append, delete_where, merge_into, ...) and, when
        a racing writer wins the version (SnapshotConflict from the
        O_EXCL publish), re-run it against the NEW head — the commit
        callable re-reads ``current_version()`` internally, so the retry
        recomputes against the winner's state rather than replaying a
        stale plan. This is the whole multi-writer protocol of a
        manifest table: writers never lock, losers redo O(their delta)
        work, and every published version is consistent. Raises the
        last SnapshotConflict after ``retries`` defeats (a hot table
        needs coarser batching, not more retries)."""
        last: Exception | None = None
        for _ in range(retries):
            try:
                return op(self)
            except SnapshotConflict as exc:
                last = exc
        raise last

    # ------------------------------------------------- schema evolution

    def alter_add_column(self, name: str, ddl_type: str) -> int:
        """Metadata-only ADD COLUMN: publish the head's exact file list
        with the column appended to the manifest schema — zero data
        rewritten, every existing row reads the new column as NULL, and
        time travel below this version never sees it. This is why
        manifest-recorded schemas beat file-sniffed ones: column DDL on
        a 100 TB table is one tiny JSON commit."""
        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        m = self._manifest(head)
        schema = m.get("schema") or []
        if any(n == name for n, _ in schema):
            raise SchemaConflict(f"column {name!r} already exists")
        self._publish(
            head + 1,
            f"add-column:{name}",
            m["files"],
            m.get("stats", {}),
            schema + [[name, ddl_type]],
        )
        return head + 1

    def alter_drop_column(self, name: str) -> int:
        """Metadata-only DROP COLUMN: same files, schema minus the
        column — readers project it away, the bytes stay in place until
        the files are naturally rewritten (compact/delete) and age out.
        Rollback/time travel restores it, because each version owns its
        schema."""
        head = self.current_version()
        if head is None:
            raise NoSuchVersion("empty table")
        m = self._manifest(head)
        schema = m.get("schema") or []
        if not any(n == name for n, _ in schema):
            raise SchemaConflict(f"no such column {name!r}")
        self._publish(
            head + 1,
            f"drop-column:{name}",
            m["files"],
            m.get("stats", {}),
            [[n, t] for n, t in schema if n != name],
        )
        return head + 1

    def append_stream_batch(self, df: DataFrame, batch_id: int) -> int | None:
        """Exactly-once append for a foreachBatch sink: the micro-batch
        id commits INSIDE the manifest op string, so the data and the
        "was this batch applied" marker publish in one atomic O_EXCL
        write. foreachBatch is at-least-once (a crash between sink
        write and checkpoint commit replays the batch); a replayed id
        finds its marker in history and is skipped — returns None —
        instead of double-appending. A crash BEFORE publish leaves
        orphans and no marker: the replay stages a fresh commit dir and
        publishes (the orphans age out via vacuum). History scan is
        O(versions) of tiny JSON, plus the marker file vacuum() folds
        aged-out markers into — so replay protection survives manifest
        retention; batch ids are monotonic per checkpoint, so pair a
        fresh checkpoint with a fresh table (same contract as
        stream_rollup_to_parquet's marker)."""
        marker = f"stream-append:{batch_id}"
        if self._batch_applied(marker):
            return None
        head = self.current_version()
        nxt = (head or 0) + 1
        schema = self._evolved_schema(head, df)
        files = self._write_commit_files(df, nxt)
        old = self._manifest(head)["files"] if head else []
        self._publish(
            nxt,
            marker,
            old + files,
            self._carry_stats(head, old, files),
            schema,
        )
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
        new_files = files
        if op == "append" and head is not None:
            files = self._manifest(head)["files"] + files
        elif op not in ("append", "overwrite"):
            raise ValueError(f"unsupported op {op!r}")
        kept = [f for f in files if f not in set(new_files)]
        self._publish(
            nxt,
            f"wap-{op}",
            files,
            self._carry_stats(head, kept, new_files),
            self._evolved_schema(head, df) if op == "append" else self._schema_of(df),
        )
        return nxt, report
