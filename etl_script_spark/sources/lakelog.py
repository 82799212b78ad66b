"""Minimal lakehouse commit log: snapshot isolation, time travel, and
optimistic multi-writer concurrency over plain parquet — from scratch.

The reference's importers are single-writer replace/upsert jobs
(smf-api ImportDbdFinancial.php:209-212 holds a DB transaction); at
100 TB the equivalent needs TABLE-level transactions over object
storage. Delta/Iceberg are absent from this container, so — like the
from-scratch Avro and BIFF8 codecs — the transaction-log DESIGN is
implemented from first principles, the same shape those formats use:

- A table is a directory: immutable data files under ``data/`` plus a
  ``_commits/`` log of JSON entries ``0000000001.json`` … Each commit
  records its action (``append`` | ``overwrite``), the data files it
  adds, and its parent version.
- A snapshot at version V is pure log replay: walk commits 1..V,
  ``overwrite`` resets the file list, ``append`` extends it. Readers
  NEVER list ``data/`` (half-written files are invisible until their
  commit lands) — that is snapshot isolation.
- Writers are OPTIMISTIC: stage data files, then try to create the
  next commit file with O_CREAT|O_EXCL — an atomic compare-and-swap
  on any POSIX filesystem. A loser gets EEXIST, re-reads the new head,
  and retries against it; appends always merge (their file sets are
  disjoint by staging id), so retry means re-CAS, not re-copy.
- Time travel is free: any past version's file list replays the same
  way, and nothing ever mutates a data file.
- Every CHECKPOINT_INTERVAL commits, the winning writer also
  publishes a checkpoint (the full file list at that version), so
  snapshot replay opens O(interval) commit files instead of
  O(versions) — the Delta `_last_checkpoint` idea. Checkpoints are
  an OPTIMIZATION, not a correctness dependency: a missing one just
  means longer replay.
- Every commit records the table's column schema (name + type,
  nullability-insensitive) and a fingerprint of it; an ``append``
  whose schema differs from the table's current schema RAISES at
  commit time — validate-don't-default, because a silently drifted
  append poisons every later snapshot read. ``overwrite`` resets the
  schema like it resets the file list.

Honest scope note: O_EXCL/link(2) is the local-FS stand-in for what
S3/HDFS deployments do with conditional PUTs / atomic renames; the
log format and replay semantics are the portable part. Data staged
by a writer that lost its CAS and gave up is orphaned (invisible to
every reader) — a vacuum that lists data/ against the live file set
reclaims it, exactly as in Delta/Iceberg.
"""

from __future__ import annotations

import json
import os
import uuid
from hashlib import md5

CHECKPOINT_INTERVAL = 10


def _commit_dir(table: str) -> str:
    return os.path.join(table, "_commits")


def _commit_path(table: str, version: int) -> str:
    return os.path.join(_commit_dir(table), f"{version:010d}.json")


def _ckpt_path(table: str, version: int) -> str:
    return os.path.join(_commit_dir(table), f"{version:010d}.ckpt.json")


def _schema_info(df) -> dict:
    """Canonical (name, type) schema + fingerprint — nullability- and
    metadata-insensitive, so writer-side nullable drift can't produce
    false mismatches."""
    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    canon = json.dumps(cols)
    return {"columns": cols, "fingerprint": md5(canon.encode()).hexdigest()}


def latest_version(table: str) -> int:
    """Current table version; 0 = empty table (no commits)."""
    d = _commit_dir(table)
    if not os.path.isdir(d):
        return 0
    vs = [
        int(f.split(".")[0])
        for f in os.listdir(d)
        if f.endswith(".json") and not f.endswith(".ckpt.json")
    ]
    return max(vs, default=0)


def _read_commit(table: str, version: int) -> dict:
    with open(_commit_path(table, version)) as f:
        return json.load(f)


def _checkpoint_versions(table: str) -> list[int]:
    d = _commit_dir(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(d)
        if f.endswith(".ckpt.json")
    )


def snapshot_files(table: str, version: int | None = None) -> list[str]:
    """Data files visible at ``version`` (default: latest), by log
    replay — overwrite resets, append extends. Never lists data/.
    Replay starts from the newest checkpoint at or before the target
    version, so cost is O(CHECKPOINT_INTERVAL) commit reads, not
    O(versions)."""
    head = latest_version(table) if version is None else version
    if version is not None and (
        version < 0 or version > latest_version(table)
    ):
        raise ValueError(
            f"lakelog: version {version} outside [0, "
            f"{latest_version(table)}]"
        )
    files: list[str] = []
    start = 1
    ckpts = [c for c in _checkpoint_versions(table) if c <= head]
    if ckpts:
        with open(_ckpt_path(table, ckpts[-1])) as f:
            ck = json.load(f)
        files = list(ck["files"])
        start = ckpts[-1] + 1
    for v in range(start, head + 1):
        c = _read_commit(table, v)
        if c["action"] == "overwrite":
            files = list(c["files"])
        elif c["action"] == "append":
            files += list(c["files"])
        else:
            raise ValueError(f"lakelog: unknown action {c['action']!r}")
    return [os.path.join(table, p) for p in files]


def table_schema(table: str, version: int | None = None) -> dict | None:
    """The (name, type) schema recorded at ``version`` (default:
    head); None for an empty table or a pre-schema (round-9) log."""
    head = latest_version(table) if version is None else version
    if head == 0:
        return None
    return _read_commit(table, head).get("schema")


def _maybe_checkpoint(table: str, version: int) -> None:
    """Publish a checkpoint at ``version`` if it's on the interval.
    Same fsync+link discipline as commits; losing the race (EEXIST)
    or crashing mid-write is harmless — checkpoints are derived
    state, and the tmp file never carries the published name."""
    if version % CHECKPOINT_INTERVAL != 0:
        return
    rel = [
        os.path.relpath(p, table) for p in snapshot_files(table, version)
    ]
    entry = {
        "version": version,
        "files": rel,
        "schema": table_schema(table, version),
    }
    d = _commit_dir(table)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _ckpt_path(table, version))
    except FileExistsError:
        pass
    finally:
        os.unlink(tmp)


def _try_commit(table: str, version: int, entry: dict) -> bool:
    """Atomic CAS: publish commit file ``version`` exclusively.

    The entry is FULLY WRITTEN AND FSYNCED to a hidden temp file
    first, then ``os.link`` publishes it under the commit name —
    link(2) is atomic and fails with EEXIST on conflict, so a commit
    file either does not exist or is complete. (The first version
    created the commit with O_CREAT|O_EXCL and THEN wrote the JSON,
    so a concurrent reader could open an empty/partial commit and
    crash in json.load — breaking the module's own snapshot-isolation
    claim.) The directory is fsynced after the link so the published
    name itself is durable."""
    d = _commit_dir(table)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _commit_path(table, version))
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)
    dfd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return True


def write_table(
    df,
    table: str,
    mode: str = "append",
    max_retries: int = 20,
) -> int:
    """Transactionally write ``df`` into the table. Data files stage
    under a unique ``data/<uuid>/`` prefix first (invisible to every
    reader), then the commit CASes in; on conflict the commit retries
    against the new head WITHOUT rewriting data. Returns the committed
    version."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"lakelog: mode must be append|overwrite, not {mode}")
    info = _schema_info(df)
    stage = f"data/{uuid.uuid4().hex}"
    out = os.path.join(table, stage)
    df.write.mode("error").parquet(out)
    rel_files = [
        f"{stage}/{f}"
        for f in os.listdir(out)
        if f.endswith(".parquet")
    ]
    for _ in range(max_retries):
        head = latest_version(table)
        if mode == "append" and head > 0:
            cur = table_schema(table, head)
            if cur is not None and cur["fingerprint"] != info["fingerprint"]:
                raise ValueError(
                    "lakelog: append schema does not match the table —"
                    f" table has {cur['columns']}, append has"
                    f" {info['columns']}; overwrite to change schema"
                )
        entry = {
            "version": head + 1,
            "parent": head,
            "action": mode,
            "files": rel_files,
            "schema": info,
        }
        if _try_commit(table, head + 1, entry):
            _maybe_checkpoint(table, head + 1)
            return head + 1
    raise RuntimeError(
        f"lakelog: commit lost the CAS {max_retries} times — raise "
        "max_retries or investigate writer contention"
    )


def upsert_table(
    spark,
    df,
    table: str,
    keys: list[str],
    order_col: str | None = None,
    max_retries: int = 10,
) -> int:
    """Transactional keyed upsert (the reference's updateOrCreate —
    ImportDbdFinancial.php:209-212 — at table scope): merge ``df``
    into the CURRENT snapshot last-write-wins and commit the result
    as an overwrite whose version CASes directly after the snapshot
    it read. Unlike a plain append, a lost CAS here means the merge
    input changed, so the loser RE-READS the new head, RE-MERGES and
    re-stages — full serializability: every committed upsert is a
    function of its immediate parent. Concurrent appends interleave
    safely: whichever lands first, the other retries on top.

    Returns the committed version."""
    from etl_script_spark.operators.merge import upsert as _merge_upsert

    for _ in range(max_retries):
        head = latest_version(table)
        if head == 0:
            cols = [c for c in df.columns if c != order_col]
            target = spark.createDataFrame([], df.select(*cols).schema)
        else:
            target = read_table(spark, table, version=head)
        merged = _merge_upsert(target, df, keys, order_col)
        info = _schema_info(merged)
        stage = f"data/{uuid.uuid4().hex}"
        out = os.path.join(table, stage)
        merged.write.mode("error").parquet(out)
        rel_files = [
            f"{stage}/{f}" for f in os.listdir(out) if f.endswith(".parquet")
        ]
        entry = {
            "version": head + 1,
            "parent": head,
            "action": "overwrite",
            "files": rel_files,
            "schema": info,
            "op": "upsert",
        }
        if latest_version(table) == head and _try_commit(
            table, head + 1, entry
        ):
            _maybe_checkpoint(table, head + 1)
            return head + 1
        # lost the race: the staged merge is stale (orphaned for
        # vacuum) — recompute against the new head
    raise RuntimeError(
        f"lakelog: upsert lost the CAS {max_retries} times — raise "
        "max_retries or investigate writer contention"
    )


def read_table(spark, table: str, version: int | None = None):
    """Snapshot read, optionally time-traveled to ``version``. An
    empty table (version 0) reads as an empty file list error — the
    caller owns schema-on-empty semantics."""
    files = snapshot_files(table, version)
    if not files:
        raise ValueError("lakelog: table is empty at this version")
    return spark.read.parquet(*files)
