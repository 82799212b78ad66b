"""Custom Python DataSource (Spark 4 DataSource API): paged-feed
reader.

The reference's REST ingestion (S10, PublicApiController-style paged
endpoints) is driver-side tooling in this engine: fetch pages to a
bronze directory, then read. This module is the Spark-4-native form
of the READ half — a registered ``paged_feed`` format whose planner
turns each page file into an InputPartition, so a 10k-page drop
directory scans with full task parallelism, schema projection, and
the usual `spark.read.format(...)` surface instead of a bespoke
loader function.

Pattern notes (this is the template any future custom source in this
repo should follow):

- ``schema()`` declares the fixed DDL; Spark handles column pruning
  downstream (a Python data source receives no pushdown — filters
  run in Spark above the scan, which is why formats with native
  pushdown (parquet/ORC) stay the default for heavy tables).
- ``partitions()`` lists the page files — planning metadata only,
  no data IO on the driver.
- ``read(partition)`` runs ON EXECUTORS, yielding plain tuples; one
  page per task keeps memory flat no matter the feed size.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

PAGED_FEED_SCHEMA = "doc_no string, amount double, page int"


@dataclass
class _PagePartition(InputPartition):
    path: str
    page: int


class PagedFeedReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("paged_feed requires option 'path'")

    def partitions(self):
        pages = sorted(
            f for f in os.listdir(self.dir) if f.endswith(".json")
        )
        # the page id is the digit run immediately before .json
        # (page_0007.json → 7) — feeds skip page numbers when
        # upstream filters empty pages, so a positional index would
        # misattribute records; and ONLY the trailing run counts
        # (feed2024_page_3.json → 3, not 20243)
        import re

        def _page_of(f: str) -> int:
            m = re.search(r"(\d+)\.json$", f)
            return int(m.group(1)) if m else -1

        return [
            _PagePartition(os.path.join(self.dir, f), _page_of(f))
            for f in pages
        ]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for rec in json.load(fh):
                yield (rec.get("doc_no"), rec.get("amount"), partition.page)


class PagedFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_feed"

    def schema(self) -> str:
        return PAGED_FEED_SCHEMA

    def reader(self, schema):
        return PagedFeedReader(self.options)

    def simpleStreamReader(self, schema):
        return PagedFeedStreamReader(self.options)


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(PagedFeedDataSource)


class PagedFeedStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the paged feed (Spark 4
    ``SimpleDataSourceStreamReader``): the page directory is an
    append-only feed, the OFFSET is the highest page id consumed —
    each micro-batch reads exactly the pages that appeared since.

    The *Simple* stream-reader variant reads on the DRIVER — the
    documented trade for low-rate feeds (a paged REST bronze drop is
    a few pages per poll; per-partition executor reads would cost
    more in planning than the data). A high-volume stream belongs in
    ``DataSourceStreamReader`` with ``partitions()``, the streaming
    twin of the batch reader above. ``readBetweenOffsets`` replays a
    committed range bit-identically on recovery, which is what makes
    the source exactly-once under checkpoint resume."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("paged_feed stream requires option 'path'")

    def initialOffset(self):
        return {"page": -1}

    def _pages(self):
        import re

        out = []
        for f in sorted(os.listdir(self.dir)):
            m = re.search(r"(\d+)\.json$", f)
            if m:
                out.append((os.path.join(self.dir, f), int(m.group(1))))
        return out

    def _rows(self, files):
        # a LIST, not a generator: the simple-reader path pickles the
        # prefetched batch into the offset cache for replay
        out = []
        for path, page in files:
            with open(path, encoding="utf-8") as fh:
                for rec in json.load(fh):
                    out.append((rec.get("doc_no"), rec.get("amount"), page))
        return out

    def read(self, start):
        files = [(p, g) for p, g in self._pages() if g > start["page"]]
        if not files:
            return [], start
        end = {"page": max(g for _, g in files)}
        return self._rows(files), end

    def readBetweenOffsets(self, start, end):
        files = [
            (p, g)
            for p, g in self._pages()
            if start["page"] < g <= end["page"]
        ]
        return self._rows(files)

    def commit(self, end):
        pass  # the feed directory is the source of truth; nothing to ack
