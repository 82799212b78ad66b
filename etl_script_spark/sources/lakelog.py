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

Honest scope note: O_EXCL is the local-FS stand-in for what S3/HDFS
deployments do with conditional PUTs / atomic renames; the log format
and replay semantics are the portable part.
"""

from __future__ import annotations

import json
import os
import uuid


def _commit_dir(table: str) -> str:
    return os.path.join(table, "_commits")


def _commit_path(table: str, version: int) -> str:
    return os.path.join(_commit_dir(table), f"{version:010d}.json")


def latest_version(table: str) -> int:
    """Current table version; 0 = empty table (no commits)."""
    d = _commit_dir(table)
    if not os.path.isdir(d):
        return 0
    vs = [
        int(f.split(".")[0])
        for f in os.listdir(d)
        if f.endswith(".json")
    ]
    return max(vs, default=0)


def snapshot_files(table: str, version: int | None = None) -> list[str]:
    """Data files visible at ``version`` (default: latest), by log
    replay — overwrite resets, append extends. Never lists data/."""
    head = latest_version(table) if version is None else version
    if version is not None and version > latest_version(table):
        raise ValueError(
            f"lakelog: version {version} > head {latest_version(table)}"
        )
    files: list[str] = []
    for v in range(1, head + 1):
        with open(_commit_path(table, v)) as f:
            c = json.load(f)
        if c["action"] == "overwrite":
            files = list(c["files"])
        elif c["action"] == "append":
            files += list(c["files"])
        else:
            raise ValueError(f"lakelog: unknown action {c['action']!r}")
    return [os.path.join(table, p) for p in files]


def _try_commit(table: str, version: int, entry: dict) -> bool:
    """Atomic CAS: create commit file ``version`` exclusively."""
    os.makedirs(_commit_dir(table), exist_ok=True)
    try:
        fd = os.open(
            _commit_path(table, version),
            os.O_CREAT | os.O_EXCL | os.O_WRONLY,
        )
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
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
        entry = {
            "version": head + 1,
            "parent": head,
            "action": mode,
            "files": rel_files,
        }
        if _try_commit(table, head + 1, entry):
            return head + 1
    raise RuntimeError(
        f"lakelog: commit lost the CAS {max_retries} times — raise "
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
