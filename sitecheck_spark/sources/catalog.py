"""Wave-checkpoint catalog: atomic commits + resume-exactly (SURVEY.md §3.2 S4/R3).

The reference suspends/resumes by pickling its queue + seen set (SURVEY.md
§1.1). Here every crawl wave commits its post-wave state — frontier and
bloom shards full-state (small), `seen` as a per-wave DELTA with a periodic
full compaction snapshot (the cumulative seen is the one state table that
grows without bound; see commit_wave/read_state) — plus this wave's
fetch-log/findings deltas and metrics, with lineage recorded per table.

Commit protocol (works on any rename-atomic filesystem; the seam where an
Iceberg catalog drops in — snapshot commit replaces the manifest rename, and
no Iceberg runtime jar exists in this container, so parquet it is):

    1. write each table to   <base>/.tmp/<uuid>/
    2. os.rename into place  <base>/<table>/wave=<k>/
    3. write manifest JSON to <base>/.manifest.tmp, fsync,
       os.rename -> <base>/manifest.json        <- THE commit point

A job killed anywhere before step 3 leaves the previous manifest intact:
resume re-reads the last committed wave's state and recomputes the wave that
died. Orphaned table dirs from the dead wave are overwritten on rewrite and
ignored by readers (readers only follow the manifest).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "manifest.json"

# -- bucketed pages layout ---------------------------------------------------
# Parquet stand-in for Iceberg's bucket(N, url) partition transform: the
# pages table is directory-partitioned by pmod(xxhash64(url), N), so the
# per-wave fetch join prunes its scan to exactly the partitions holding
# elected urls (dynamic partition pruning; plan-asserted in
# tests/test_plans.py). Swapping in Iceberg replaces this with a real bucket
# transform and keeps the crawl-side join unchanged.

PAGES_BUCKET_COL = "url_bucket"
_BUCKETS_SIDECAR = "_url_buckets.json"


def bucket_of(url_col, n_buckets: int):
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) via the JVM Hadoop FS API — speaks every
    Spark-readable URI scheme (file:, hdfs:, s3a:, ...), unlike os.path."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _sidecar_path(table_path: str) -> str:
    return table_path.rstrip("/") + "/" + _BUCKETS_SIDECAR


def infer_bucketed_root(files: list[str]) -> str | None:
    """Root of a write_pages_bucketed directory layout from a DataFrame's
    inputFiles(): the parent of the first url_bucket=<k> path segment, or
    None if the files are not bucket-partitioned. Lets crawl() find the
    layout sidecar — the authoritative bucket count — given only the
    DataFrame it was handed."""
    for f in files:
        parts = f.split("/")
        for i, p in enumerate(parts):
            if p.startswith(PAGES_BUCKET_COL + "="):
                return "/".join(parts[:i])
    return None


def pages_sidecar_buckets(spark: SparkSession, path: str) -> int | None:
    """n_buckets from the layout sidecar, or None if `path` is not a
    write_pages_bucketed layout. Resolved through the Hadoop FileSystem API
    so remote URIs (s3a://, hdfs://) detect the bucketed layout too — an
    os.path.exists probe would silently miss it and lose DPP pruning."""
    fs, hpath = _hadoop_fs(spark, _sidecar_path(path))
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        body = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(body)["n_buckets"]


def write_pages_bucketed(pages: DataFrame, dest: str, n_buckets: int = 64) -> None:
    """Write `pages` hash-partitioned by bucket_of(url). The bucket count is
    recorded in a sidecar so readers cannot silently join with a mismatched
    modulus (which would surface as phantom 404s)."""
    spark = pages.sparkSession
    (
        pages.withColumn(PAGES_BUCKET_COL, bucket_of(F.col("url"), n_buckets))
        .write.mode("overwrite").partitionBy(PAGES_BUCKET_COL).parquet(dest)
    )
    fs, hpath = _hadoop_fs(spark, _sidecar_path(dest))
    out = fs.create(hpath, True)
    try:
        body = json.dumps({"n_buckets": n_buckets, "column": PAGES_BUCKET_COL})
        out.write(bytearray(body.encode("utf-8")))
    finally:
        out.close()


def read_pages_bucketed(spark: SparkSession, path: str) -> tuple[DataFrame, int]:
    """(pages DataFrame incl. url_bucket, n_buckets) — pass n_buckets to
    CrawlConfig.pages_buckets."""
    n_buckets = pages_sidecar_buckets(spark, path)
    if n_buckets is None:
        raise FileNotFoundError(
            f"{_sidecar_path(path)}: not a write_pages_bucketed layout"
        )
    return spark.read.parquet(path), n_buckets

# -- bucketed TABLE layout (zero-html-shuffle fetch) -------------------------

PAGES_TABLE = "pages_bucketed"


def write_pages_bucketed_table(
    pages: DataFrame, n_buckets: int = 64, table: str = PAGES_TABLE,
    path: str | None = None,
) -> None:
    """Spark bucketed-table stand-in #2 for Iceberg's bucket(N, url) — the
    storage-partitioned-join shape. The table's scan reports its hash
    bucketing to Catalyst, so the per-wave fetch join shuffles ONLY the slim
    elected-url side into the table's buckets and the version-dedup agg
    reuses the join partitioning: html:binary — the dominant bytes of a
    crawl — crosses ZERO exchanges per wave (plan-asserted in
    tests/test_plans.py). Compare write_pages_bucketed (directory layout):
    that buys dynamic partition pruning but its scan has no Catalyst-known
    partitioning, so the join must shuffle the html through disk — the
    measured 4N bottleneck on shared-disk hosts (BASELINE.md round 4).

    Wave parallelism in this mode equals n_buckets (the join/agg/parse
    stage inherits the table's buckets) — size n_buckets >= the cluster's
    cores. Requires a session catalog (warehouse dir); pass the result of
    read_pages_table to crawl() with CrawlConfig(pages_prebucketed=True)."""
    w = (
        pages.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "url").sortBy("url")
    )
    if path is not None:
        w = w.option("path", path)  # external table: files survive the session
    w.saveAsTable(table)


PAGES_DDL = "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING"


def _normalize_location(loc: str) -> str:
    for scheme in ("file://", "file:"):
        if loc.startswith(scheme):
            loc = loc[len(scheme):]
            break
    return loc.rstrip("/")


def verify_bucketed_table_layout(
    spark: SparkSession, table: str, n_buckets: int, sample: int = 100
) -> None:
    """Guard that a bucketed table's FILES were written under the declared
    spec, in two sweeps. (1) Metadata-only: EVERY data file's name must
    carry a parseable bucket id (part-*-_NNNNN.c*) below n_buckets — a
    name that does not parse fails closed instead of slipping past the
    data check as a null. (2) Data: up to `sample` files, spread
    round-robin across DISTINCT bucket ids (never just the first file a
    .limit() happens to scan), are read — url column only — and every row
    must satisfy bucket_id == pmod(hash(url), n_buckets), Spark's own
    bucketing function (Murmur3, seed 42). Spark trusts the declaration,
    so files bucketed under a different modulus would silently drop join
    matches (phantom 404s) instead of erroring."""
    import re

    info = {
        r["col_name"].strip(): (r["data_type"] or "").strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    }
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(info["Location"])
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    by_bucket: dict[int, list[str]] = {}
    saw_subdir = False
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory():
            saw_subdir = True
            continue
        if name.startswith(("_", ".")):
            continue
        m = re.search(r"_(\d{5})\.", name)
        if not m or int(m.group(1)) >= n_buckets:
            raise ValueError(
                f"table {table}: data file {name!r} has no parseable bucket "
                f"id below {n_buckets} — not written under the declared "
                f"bucket spec"
            )
        by_bucket.setdefault(int(m.group(1)), []).append(
            st.getPath().toString()
        )
    chosen: list[str] = []
    for files in by_bucket.values():
        files.sort()
    while len(chosen) < sample and any(by_bucket.values()):
        for b in sorted(by_bucket):  # round-robin: one file per bucket
            if by_bucket[b] and len(chosen) < sample:
                chosen.append(by_bucket[b].pop())
    if not chosen:
        # Distinguish "truly empty table" from "no data files at the ROOT":
        # a nested/partitioned layout (or hand-laid subdirectories) would
        # otherwise make this guard vacuously pass without checking a single
        # file. Spark's bucketed-table writer lays files flat at the root,
        # so any subdirectory — or a table that has rows despite an empty
        # root listing — means the layout is not the one this guard knows
        # how to verify; fail closed.
        if saw_subdir or spark.table(table).limit(1).count() > 0:
            raise ValueError(
                f"table {table}: no data files at the table root "
                f"{'(subdirectories present)' if saw_subdir else '(but the table has rows)'} "
                f"— nested layouts cannot be bucket-verified; refusing to "
                f"trust the declared spec"
            )
        return  # truly empty table: nothing to verify
    bad = (
        spark.read.parquet(*chosen)
        .select(
            "url",
            F.regexp_extract(F.input_file_name(), r"_(\d{5})\.", 1)
            .alias("_fb_raw"),
        )
        .withColumn(
            "_file_bucket",
            F.when(F.col("_fb_raw") != "", F.col("_fb_raw").cast("int")),
        )
        .filter(
            F.col("_file_bucket").isNull()  # unparseable fails closed
            | (F.pmod(F.hash("url"), F.lit(n_buckets))
               != F.col("_file_bucket"))
        )
        .count()
    )
    if bad:
        raise ValueError(
            f"table {table}: file bucket ids do not match "
            f"pmod(hash(url), {n_buckets}) — files were written under a "
            f"different bucket spec than declared"
        )


def register_pages_bucketed_table(
    spark: SparkSession, path: str, n_buckets: int = 64,
    table: str = PAGES_TABLE, schema_ddl: str = PAGES_DDL,
    verify_sample: int = 100,
) -> DataFrame:
    """Re-declare an existing bucketed-table directory in THIS session's
    catalog. The default (non-Hive) catalog is session-scoped, so the
    bucketing metadata — the part that makes the fetch join exchange-free —
    must be re-registered per session; the files themselves carry the
    bucket ids in their names and are reused as-is. The declared spec MUST
    match the writing spec (same n_buckets, same cluster column) — Spark
    trusts the declaration, so this guards the trust: an existing catalog
    entry with a different location/bucket spec raises instead of being
    silently reused, and a file sample is checked against the declared
    modulus (verify_bucketed_table_layout; verify_sample=0 skips)."""
    if spark.catalog.tableExists(table):
        info = {
            r["col_name"].strip(): (r["data_type"] or "").strip()
            for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        }
        have_n = info.get("Num Buckets", "")
        have_cols = info.get("Bucket Columns", "")
        have_loc = _normalize_location(info.get("Location", ""))
        want_loc = _normalize_location(path)
        problems = []
        if have_n != str(n_buckets):
            problems.append(f"num buckets {have_n!r} != {n_buckets}")
        if have_cols.replace("`", "") not in ("[url]",):
            problems.append(f"bucket columns {have_cols!r} != [url]")
        if have_loc != want_loc:
            problems.append(f"location {have_loc!r} != {want_loc!r}")
        if problems:
            raise ValueError(
                f"table {table} already exists with a different spec "
                f"({'; '.join(problems)}) — drop it or register under "
                f"another name"
            )
    else:
        spark.sql(
            f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
            f"CLUSTERED BY (url) SORTED BY (url) INTO {n_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
    if verify_sample:
        verify_bucketed_table_layout(spark, table, n_buckets, verify_sample)
    return spark.table(table)


def read_pages_table(spark: SparkSession, table: str = PAGES_TABLE) -> DataFrame:
    return spark.table(table)


STATE_TABLES = ("frontier", "seen", "shards")
DELTA_TABLES = ("fetch_log", "findings")


def _has_scheme(path: str) -> bool:
    import re

    return bool(re.match(r"[A-Za-z][A-Za-z0-9+.-]*:", path))


class WaveCatalog:
    """Wave-granular checkpoint store with an atomic rename-commit manifest.

    `base_dir` may be a plain local path (fast path: os/shutil) or any
    Spark-readable URI (file://, hdfs://, s3a://, ...) — URI bases route
    every write (table rename-into-place, manifest tmp+rename) through the
    JVM Hadoop FileSystem API, the same seam the read side
    (read_deltas_through, pages_sidecar_buckets) already uses, so the
    commit protocol runs wherever the cluster's checkpoints live, not just
    on the driver's local disk. Caveat inherited from the FS: rename is
    atomic on HDFS/file, copy-based on raw S3 (use a consistent committer
    layer there, as any Spark job must).

    `spark` is required for URI bases (the Hadoop FS lives in the JVM);
    the local fast path works without it.
    """

    def __init__(self, base_dir: str, spark: SparkSession | None = None):
        self.base = base_dir.rstrip("/")
        self.spark = spark
        self.remote = _has_scheme(self.base)
        if not self.remote:
            os.makedirs(base_dir, exist_ok=True)
        else:
            fs, hpath = self._fs(self.base)
            fs.mkdirs(hpath)

    def _fs(self, path: str):
        if self.spark is None:
            raise ValueError(
                f"WaveCatalog base {self.base!r} is a URI — pass the "
                f"SparkSession so the Hadoop FileSystem API is reachable"
            )
        return _hadoop_fs(self.spark, path)

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self) -> str:
        if self.remote:
            return self.base + "/" + MANIFEST
        return os.path.join(self.base, MANIFEST)

    def read_manifest(self) -> dict | None:
        if self.remote:
            fs, hpath = self._fs(self._manifest_path())
            if not fs.exists(hpath):
                # The remote delete+rename fallback in commit_wave has a
                # crash window between the delete and the rename where no
                # manifest exists — but the fully-written, hsync'd
                # .manifest.tmp does. Recover from it rather than silently
                # discarding every committed wave (a clean restart is
                # correct but defeats the checkpoint store's purpose in
                # exactly the crash it exists to survive). A torn tmp from
                # a mid-write crash fails json parsing and is ignored.
                _, tpath = self._fs(self.base + "/.manifest.tmp")
                if not fs.exists(tpath):
                    return None
                stream = fs.open(tpath)
                try:
                    body = self.spark._jvm.org.apache.commons.io.IOUtils \
                        .toString(stream, "UTF-8")
                finally:
                    stream.close()
                try:
                    return json.loads(body)
                except ValueError:
                    return None
            stream = fs.open(hpath)
            try:
                body = self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            finally:
                stream.close()
            return json.loads(body)
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def last_committed_wave(self) -> int | None:
        m = self.read_manifest()
        return None if m is None else m["committed_wave"]

    # -- table IO ----------------------------------------------------------

    def _table_dir(self, name: str, wave: int) -> str:
        if self.remote:
            return f"{self.base}/{name}/wave={wave}"
        return os.path.join(self.base, name, f"wave={wave}")

    def _write_table(self, df: DataFrame, name: str, wave: int) -> dict:
        dest = self._table_dir(name, wave)
        if self.remote:
            tmp = f"{self.base}/.tmp/{uuid.uuid4().hex}"
            df.write.mode("overwrite").parquet(tmp)
            jvm = df.sparkSession._jvm
            fs, dpath = _hadoop_fs(df.sparkSession, dest)
            if fs.exists(dpath):  # orphan from a killed uncommitted wave
                fs.delete(dpath, True)
            fs.mkdirs(dpath.getParent())
            if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dpath):
                raise IOError(f"rename {tmp} -> {dest} failed")
            sizes = [
                st.getLen() for st in fs.listStatus(dpath)
                if st.getPath().getName().endswith(".parquet")
            ]
            return {"path": dest, "n_files": len(sizes), "bytes": sum(sizes)}
        tmp = os.path.join(self.base, ".tmp", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(tmp)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        if os.path.exists(dest):  # orphan from a killed uncommitted wave
            shutil.rmtree(dest)
        os.rename(tmp, dest)
        sizes = [
            e.stat().st_size for e in os.scandir(dest) if e.name.endswith(".parquet")
        ]
        return {"path": dest, "n_files": len(sizes), "bytes": sum(sizes)}

    def read_table(self, spark: SparkSession, name: str, wave: int) -> DataFrame:
        return spark.read.parquet(self._table_dir(name, wave))

    def has_table(self, name: str, wave: int) -> bool:
        m = self.read_manifest() or {}
        return name in m.get("waves", {}).get(str(wave), {}).get("lineage", {})

    def read_state(self, spark: SparkSession, name: str, wave: int) -> DataFrame:
        """Full state of `name` as of `wave`: the newest kind="full" snapshot
        at or before `wave`, unioned with every kind="delta" commit after it
        (delta rows are disjoint by construction, so plain union IS the
        state). Tables committed full-state every wave — frontier, shards,
        and every pre-delta-era checkpoint (lineage entries without a
        "kind") — degrade to a single-path read."""
        m = self.read_manifest() or {"waves": {}}
        paths: list[str] = []
        for k in range(wave, -1, -1):
            ent = m["waves"].get(str(k), {}).get("lineage", {}).get(name)
            if ent is None:
                continue
            paths.append(ent["path"])
            if ent.get("kind", "full") == "full":
                break
        if not paths:  # manifest predates lineage bookkeeping
            return self.read_table(spark, name, wave)
        return spark.read.parquet(*reversed(paths))

    def read_deltas_through(self, spark: SparkSession, name: str, wave: int) -> DataFrame:
        """Per-wave delta tables (fetch_log / findings) unioned through
        `wave`. Paths come from the manifest lineage — the commit point, so
        orphaned dirs from a killed wave are never read — with a Hadoop-FS
        existence probe (remote-URI-safe, unlike os.path) only for waves
        predating lineage bookkeeping."""
        m = self.read_manifest() or {"waves": {}}
        paths: list[str] = []
        fs = None
        for k in range(wave + 1):
            ent = m["waves"].get(str(k), {}).get("lineage", {}).get(f"{name}_delta")
            if ent is not None:
                paths.append(ent["path"])
                continue
            p = self._table_dir(name, k)
            if fs is None:
                fs, _ = _hadoop_fs(spark, p)
            if fs.exists(spark._jvm.org.apache.hadoop.fs.Path(p)):
                paths.append(p)
        return spark.read.parquet(*paths)

    # -- commit ------------------------------------------------------------

    def commit_wave(
        self,
        wave: int,
        state: dict[str, DataFrame],
        deltas: dict[str, DataFrame],
        metrics: dict | None = None,
        config: dict | None = None,
        state_kinds: dict[str, str] | None = None,
    ) -> None:
        """state_kinds marks a state table's commit as "full" (default) or
        "delta" (this wave's new rows only; read back via read_state).
        Delta commits keep per-wave checkpoint I/O O(wave delta) instead of
        O(cumulative state) — the difference between linear and quadratic
        total checkpoint bytes over a long crawl."""
        lineage: dict[str, dict] = {}
        for name, df in state.items():
            ent = self._write_table(df, name, wave)
            ent["kind"] = (state_kinds or {}).get(name, "full")
            lineage[name] = ent
        for name, df in deltas.items():
            lineage[f"{name}_delta"] = self._write_table(df, name, wave)

        prev = self.read_manifest() or {"waves": {}}
        prev["committed_wave"] = wave
        if config is not None:
            prev["config"] = config
        prev.setdefault("waves", {})[str(wave)] = {
            "lineage": lineage,
            "metrics": metrics or {},
        }
        body = json.dumps(prev, indent=1)
        if self.remote:
            # same tmp+rename commit point, through the Hadoop FS: hflush
            # pushes the bytes to the FS before the rename makes them the
            # manifest (hsync where the FS honors it).
            fs, tpath = self._fs(self.base + "/.manifest.tmp")
            out = fs.create(tpath, True)
            try:
                out.write(bytearray(body.encode("utf-8")))
                try:
                    out.hsync()
                except Exception:
                    out.hflush()
            finally:
                out.close()
            jvm = self.spark._jvm
            mpath = jvm.org.apache.hadoop.fs.Path(self._manifest_path())
            try:
                # FileContext rename(OVERWRITE): atomic on HDFS/file — no
                # manifest-less window for a concurrent reader.
                fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                    tpath.toUri(), self.spark._jsc.hadoopConfiguration()
                )
                rename_cls = getattr(jvm.org.apache.hadoop.fs, "Options$Rename")
                opts = self.spark.sparkContext._gateway.new_array(rename_cls, 1)
                opts[0] = rename_cls.OVERWRITE
                fc.rename(tpath, mpath, opts)
            except Exception:
                # FS without a FileContext binding (some object stores):
                # delete+rename — a crash between the two leaves the valid
                # .manifest.tmp behind, never a corrupt manifest.
                if fs.exists(mpath):
                    fs.delete(mpath, False)  # plain rename won't overwrite
                if not fs.rename(tpath, mpath):
                    raise IOError(
                        f"manifest rename failed under {self.base}"
                    )
            return
        tmp = os.path.join(self.base, ".manifest.tmp")
        with open(tmp, "w") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path())
