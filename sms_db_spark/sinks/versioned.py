"""Versioned parquet store: a minimal commit-pointer table format that
CLOSES atomic_swap's between-renames window instead of documenting it.

Layout:

    <store>/_versions/v00000001/   immutable data dirs, one per commit
    <store>/_versions/v00000002/
    <store>/_HEAD                  tiny text file naming the live version

A commit writes a NEW version dir in full, then flips `_HEAD` with
`write_text_atomic` (FileContext atomic replace). Readers resolve
`_HEAD` and read that dir. The store is therefore NEVER missing and
never half-replaced: a crash before the flip leaves an invisible orphan
dir (pruned later); a crash during the flip leaves the old pointer
fully intact. This is the metadata/pointer layer `fsutil.atomic_swap`'s
docstring names as the real fix for its rename gap — the same
commit-discipline as a Delta/Iceberg log, cut down to a single-table,
single-writer store (one pointer, no manifest compaction, no
concurrent-writer arbitration; writers must be externally serialized,
the same contract as streaming/shards.fold_cold_batches).

Readers vs pruning (the vacuum caveat, stated honestly): a reader that
resolved `_HEAD` and is still scanning while `prune_versions` deletes
its version would fail mid-read. Retention is therefore version-count
based with keep >= 2 enforced, so only readers older than a full commit
cycle can race — at 100 TB, set `keep` to cover the longest-running
query, exactly as Delta's vacuum retention is sized.

Reference parity: the reference rebuilds its whole SQLite store file on
re-import and relies on the filesystem for durability (sms-db.pl:49);
this module is that total-replacement model made crash-safe for a
directory-of-parquet store.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..fsutil import hadoop_fs, read_text, write_text_atomic

_VERSIONS = "_versions"
_HEAD = "_HEAD"


def _paths(spark: SparkSession, store: str):
    jvm, fs = hadoop_fs(spark, store)
    root = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(store)).toString()
    return jvm, fs, root


def _version_dirs(jvm, fs, root: str) -> list[str]:
    base = jvm.org.apache.hadoop.fs.Path(f"{root}/{_VERSIONS}")
    if not fs.exists(base):
        return []
    names = []
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v") and name[1:].isdigit():
            names.append(name)
    return sorted(names)


def current_version(spark: SparkSession, store: str) -> str | None:
    """The live version name, or None for a store with no commit yet."""
    head = read_text(spark, f"{store.rstrip('/')}/{_HEAD}")
    if head is None:
        return None
    return json.loads(head)["version"]


def commit_version(spark: SparkSession, store: str, df: DataFrame) -> str:
    """Commit `df` as the store's new live version and return its name.

    The data lands COMPLETELY before the pointer moves; the old version
    stays on disk (readable by in-flight readers, restorable by pointing
    `_HEAD` back) until pruned. Version numbers advance past every dir
    present — committed or orphaned — so a crashed writer's leftovers
    can never be re-entered."""
    jvm, fs, root = _paths(spark, store)
    existing = _version_dirs(jvm, fs, root)
    n = (int(existing[-1][1:]) + 1) if existing else 1
    name = f"v{n:08d}"
    df.write.mode("error").parquet(f"{root}/{_VERSIONS}/{name}")
    write_text_atomic(
        spark, f"{root}/{_HEAD}", json.dumps({"version": name}, sort_keys=True)
    )
    return name


def read_current(spark: SparkSession, store: str) -> DataFrame:
    """The live version's data. Raises loudly on a store with no commit
    (a missing pointer with data present would mean an interrupted
    FIRST commit — the orphan dir is invisible by design)."""
    v = current_version(spark, store)
    if v is None:
        raise FileNotFoundError(f"no committed version at {store} (missing {_HEAD})")
    return spark.read.parquet(f"{store.rstrip('/')}/{_VERSIONS}/{v}")


def rewrite_current(spark: SparkSession, store: str, transform) -> str:
    """Maintenance without a missing-store window: read the live
    version, apply `transform` (compaction's coalesce, a Z-order sort,
    a merge result — any DataFrame -> DataFrame), commit the result as
    the next version. At every instant `_HEAD` names a complete
    dataset; there is nothing to recover at job entry."""
    return commit_version(spark, store, transform(read_current(spark, store)))


def prune_versions(spark: SparkSession, store: str, keep: int = 2) -> list[str]:
    """Delete all but the newest `keep` version dirs (the live version
    is always among them — `_HEAD` only ever points at the newest).
    keep >= 2 is enforced so one full commit cycle of readers is always
    safe. Returns the deleted version names. Orphans from crashed
    commits are older than the live version by construction, so they
    age out through the same retention."""
    if keep < 2:
        raise ValueError(f"keep must be >= 2 (got {keep}): retention is the only "
                         "protection in-flight readers have")
    jvm, fs, root = _paths(spark, store)
    live = current_version(spark, store)
    names = _version_dirs(jvm, fs, root)
    doomed = [n for n in names[:-keep] if n != live]
    for n in doomed:
        if not fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{_VERSIONS}/{n}"), True):
            raise RuntimeError(f"prune failed deleting {store}/{_VERSIONS}/{n}")
    return doomed


def history(spark: SparkSession, store: str) -> list[dict]:
    """Every version dir with its live/orphan status — the audit surface
    (a dir newer than `_HEAD` is a crashed, never-committed write)."""
    jvm, fs, root = _paths(spark, store)
    live = current_version(spark, store)
    out = []
    for name in _version_dirs(jvm, fs, root):
        status = "live" if name == live else (
            "orphan" if live is None or name > live else "old"
        )
        out.append({"version": name, "status": status})
    return out
