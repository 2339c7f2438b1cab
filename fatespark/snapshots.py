"""Snapshot log + time travel for index directories — the Iceberg-commit
seam made real.

Every publish (`IndexBuilder._finalize`), delete, and vacuum appends one row
to ``{dir}/snapshots/``: (snapshot_id, parent_id, ts, operation, build_id,
tables_json), where tables_json maps each logical table (docs, postings,
terms, meta, field_stats, tombstones) to the RELATIVE physical paths that
constitute it in that snapshot. Data paths are immutable once committed:
a writer about to overwrite or drop a live path first calls :func:`archive`,
which *moves* it under ``{dir}/_archive/g{n}/`` (same-filesystem rename, no
copy) and rewrites the affected path strings in the log — logical history
never changes, only physical locations. Readers time-travel with
``SearchIndex(spark, dir, snapshot_id=...)`` or ``as_of=<unix ts>``;
:func:`expire` drops archived generations referenced only by expired
snapshots, exactly like Iceberg's ``expireSnapshots``.

On a real cluster each logical table is an Iceberg table and this module
collapses into the catalog's own snapshot/commit machinery (build.py module
docstring); here the log itself is the same local-parquet append used by the
manifest, so commits are one tiny file write — no Spark job.

Concurrency contract: ONE writer per index directory (the same contract the
build/vacuum machinery already has); any number of readers. A reader that
resolved a snapshot keeps working through archives because data paths are
only ever renamed, never rewritten; a writer crash between an archive and
its follow-up commit can leave the newest snapshot pointing at a moved path
— resolve() then fails loudly and the standard resume (rebuild chunk +
re-finalize) publishes a fresh, consistent snapshot. On Iceberg the
catalog's atomic swap removes even that window.

Reference analogue: fates publishes via tmpdir + ``File.rename`` and keeps
no history (``lib/fragment_writer.rb:22-26,45-52``); retained snapshots +
time travel are target-new per the north rule's Iceberg deployment model.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

import pandas as pd

SNAP = "snapshots"
ARCHIVE = "_archive"

# logical tables a snapshot captures; docs/postings are lists of chunk dirs
TABLES = ("docs", "postings", "terms", "meta", "field_stats", "tombstones")


def _log_dir(index_dir: str) -> str:
    return os.path.join(index_dir, SNAP)


def read_log(index_dir: str) -> pd.DataFrame | None:
    """Snapshot rows sorted by snapshot_id, or None if never committed."""
    from .build import _read_local_parquet
    log = _read_local_parquet(_log_dir(index_dir))
    if log is None or log.empty:
        return None
    return log.sort_values("snapshot_id").reset_index(drop=True)


def current_id(index_dir: str) -> int:
    log = read_log(index_dir)
    return 0 if log is None else int(log["snapshot_id"].max())


def live_tables(index_dir: str) -> dict[str, list[str]]:
    """Relative physical paths of every logical table as laid out on disk
    right now — what a commit should record."""
    out: dict[str, list[str]] = {}
    for name in ("docs", "postings"):
        chunks = sorted(glob.glob(os.path.join(index_dir, name, "chunk=*")))
        if chunks:
            out[name] = [os.path.relpath(c, index_dir) for c in chunks]
        elif os.path.isdir(os.path.join(index_dir, name)):
            out[name] = [name]  # chunkless (post-vacuum) layout
    for name in ("terms", "meta", "field_stats"):
        if os.path.isdir(os.path.join(index_dir, name)):
            out[name] = [name]
    tomb = sorted(glob.glob(os.path.join(index_dir, "tombstones",
                                         "*.parquet")))
    if tomb:  # individual files: later deletes append, snapshots pin a set
        out["tombstones"] = [os.path.relpath(f, index_dir) for f in tomb]
    return out


def commit(index_dir: str, operation: str, build_id: str = "",
           tables: dict[str, list[str]] | None = None) -> int:
    """Append a snapshot pinning ``tables`` (default: the live layout)."""
    from .build import _write_local_parquet
    tables = tables if tables is not None else live_tables(index_dir)
    sid = current_id(index_dir) + 1
    _write_local_parquet(pd.DataFrame([{
        "snapshot_id": sid, "parent_id": sid - 1, "ts": float(time.time()),
        "operation": operation, "build_id": build_id,
        "tables_json": json.dumps(tables, sort_keys=True),
    }]), _log_dir(index_dir))
    return sid


def archive(index_dir: str, relpaths: list[str]) -> None:
    """Move live ``relpaths`` (dirs or files) into a fresh archive
    generation and repoint every snapshot that references them. No-op for
    paths that don't exist; never called on ``_archive`` members."""
    moved: dict[str, str] = {}
    gen = None
    for rel in relpaths:
        src = os.path.join(index_dir, rel)
        if not os.path.exists(src):
            continue
        if gen is None:
            gen = os.path.join(ARCHIVE, f"g{uuid.uuid4().hex[:12]}")
            os.makedirs(os.path.join(index_dir, gen), exist_ok=True)
        dst_rel = os.path.join(gen, rel)
        os.makedirs(os.path.dirname(os.path.join(index_dir, dst_rel)),
                    exist_ok=True)
        os.rename(src, os.path.join(index_dir, dst_rel))
        moved[rel] = dst_rel
    if not moved:
        return
    log = read_log(index_dir)
    if log is None:
        return

    def remap(p: str) -> str:
        for old, new in moved.items():
            if p == old or p.startswith(old + os.sep):
                return new + p[len(old):]
        return p

    log = log.copy()
    log["tables_json"] = [
        json.dumps({t: [remap(p) for p in ps]
                    for t, ps in json.loads(j).items()}, sort_keys=True)
        for j in log["tables_json"]]
    from .build import _write_local_parquet
    _write_local_parquet(log, _log_dir(index_dir), mode="overwrite")


def resolve(index_dir: str, snapshot_id: int | None = None,
            as_of: float | None = None) -> tuple[int, dict[str, list[str]]]:
    """(snapshot_id, logical table -> ABSOLUTE paths) for the requested
    snapshot — by id, by ``as_of`` unix timestamp (last commit at or before
    it), or the current one. Raises if the snapshot is unknown or expired."""
    log = read_log(index_dir)
    if log is None:
        raise FileNotFoundError(f"no snapshot log at {index_dir}")
    if snapshot_id is not None:
        rows = log[log["snapshot_id"] == snapshot_id]
        if rows.empty:
            raise KeyError(f"snapshot {snapshot_id} not in log "
                           f"(have {sorted(log['snapshot_id'])})")
    elif as_of is not None:
        rows = log[log["ts"] <= float(as_of)]
        if rows.empty:
            raise KeyError(f"no snapshot at or before ts={as_of}")
        rows = rows.tail(1)
    else:
        rows = log.tail(1)
    row = rows.iloc[-1]
    tables = {t: [os.path.join(index_dir, p) for p in ps]
              for t, ps in json.loads(row["tables_json"]).items()}
    missing = [p for ps in tables.values() for p in ps
               if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"snapshot {int(row['snapshot_id'])} expired: missing "
            f"{missing[:3]}")
    return int(row["snapshot_id"]), tables


def history(index_dir: str) -> pd.DataFrame:
    """(snapshot_id, parent_id, ts, operation, build_id) — the audit view."""
    log = read_log(index_dir)
    if log is None:
        return pd.DataFrame(columns=["snapshot_id", "parent_id", "ts",
                                     "operation", "build_id"])
    return log[["snapshot_id", "parent_id", "ts", "operation",
                "build_id"]].copy()


def expire(index_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete archive
    generations no surviving snapshot references (live paths are never
    deleted). Returns {'expired': n, 'freed_dirs': n}."""
    log = read_log(index_dir)
    if log is None or len(log) <= keep_last:
        return {"expired": 0, "freed_dirs": 0}
    keep = log.tail(keep_last).copy()
    kept_paths = {p for j in keep["tables_json"]
                  for ps in json.loads(j).values() for p in ps}
    kept_gens = {p.split(os.sep)[1] for p in kept_paths
                 if p.startswith(ARCHIVE + os.sep)}
    freed = 0
    for g in glob.glob(os.path.join(index_dir, ARCHIVE, "g*")):
        if os.path.basename(g) not in kept_gens:
            shutil.rmtree(g)
            freed += 1
    from .build import _write_local_parquet
    _write_local_parquet(keep.reset_index(drop=True), _log_dir(index_dir),
                         mode="overwrite")
    return {"expired": int(len(log) - keep_last), "freed_dirs": freed}


def _link_tree(src: str, dst: str) -> None:
    """Recreate ``src`` (dir or single file) at ``dst`` with hard links
    (data files are immutable once committed, so links are safe;
    expire() can later rmtree the archived name without touching the
    restored copy)."""
    if os.path.isfile(src):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(src, dst)
        return
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            os.link(os.path.join(root, f), os.path.join(out, f))


def restore(index_dir: str, snapshot_id: int) -> int:
    """Re-publish ``snapshot_id``'s table layout as the NEW current
    snapshot — Iceberg ``rollback_to_snapshot`` / the ES
    snapshot-restore lifecycle. History is append-only: nothing is
    deleted, the restore is itself a snapshot (operation='restore'),
    and the abandoned head stays time-travelable.

    The restored layout is MATERIALIZED at the canonical live paths so
    later writers (delete/vacuum/incremental commits, which record the
    disk layout) naturally see the restored state:

    1. every current live path NOT referenced by the target snapshot is
       archived away (same-filesystem rename + log repoint — this is
       how stale tombstone sets drop out of the restored view);
    2. every archived path the target references is hard-linked back to
       its canonical name (no data copy; the archived name stays valid
       for the older snapshots that still reference it);
    3. one commit pins the canonical layout.

    Returns the new snapshot id. Raises if ``snapshot_id`` is unknown.
    """
    log = read_log(index_dir)
    if log is None or snapshot_id not in set(log["snapshot_id"]):
        raise ValueError(f"unknown snapshot_id {snapshot_id}")
    row = log[log["snapshot_id"] == snapshot_id].iloc[-1]
    tables = json.loads(row["tables_json"])

    def canon(p: str) -> str:
        if p.startswith(ARCHIVE + os.sep):
            parts = p.split(os.sep)
            return os.path.join(*parts[2:])
        return p

    restored_live = {p for ps in tables.values() for p in ps
                     if not p.startswith(ARCHIVE + os.sep)}
    live = live_tables(index_dir)
    to_archive = [p for ps in live.values() for p in ps
                  if p not in restored_live]
    archive(index_dir, to_archive)
    # re-read: archive() may have repointed the target row's refs only
    # if they were live — and live refs are exactly the ones we kept
    for ps in tables.values():
        for p in ps:
            if p.startswith(ARCHIVE + os.sep):
                dst = os.path.join(index_dir, canon(p))
                if not os.path.exists(dst):
                    _link_tree(os.path.join(index_dir, p), dst)
    new_tables = {t: sorted({canon(p) for p in ps})
                  for t, ps in tables.items()}
    return commit(index_dir, "restore", build_id=f"restore-{snapshot_id}",
                  tables=new_tables)
