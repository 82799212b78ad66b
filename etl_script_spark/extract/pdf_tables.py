"""S4: distributed PDF table extraction.

Reference lifecycle (pdf_ocr_inv_to_json.py:387-421 ``run_table``):
engine cascade (camelot lattice → camelot stream → tabula), every row
tagged ``_table_index``, then header-promotion normalization
(``normalize_table_records`` :360-384 — when a table's keys are the
positional digits camelot emits, the first row IS the header).

Spark shape: ``binaryFile`` scan (or any DataFrame with ``path`` +
``content``) → ``mapInPandas``; each worker runs the cascade on its
files and emits one output row per extracted record. Ragged headers
across files make a fixed schema impossible, so records come back as
``fields map<string,string>`` plus provenance — downstream
canonicalization (P1/P2) turns map keys into columns. Partition
sizing guidance: ~100 PDFs per partition; repartition by path hash
before calling for very skewed file sizes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from etl_script_spark.extract import engines as _engines

TABLE_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("mode", T.StringType(), True),  # table-<engine> | None
        T.StructField("table_index", T.IntegerType(), True),
        T.StructField("row_index", T.IntegerType(), True),  # file order (P7/O5)
        T.StructField(
            "fields", T.MapType(T.StringType(), T.StringType()), True
        ),
    ]
)


def _norm_ws(s: str) -> str:
    return " ".join(str(s).split())


def normalize_table_records(
    tables: "list[list[dict[str, str]]]",
) -> "list[dict[str, str]]":
    """Header-promotion normalization with ``_table_index`` tagging.

    Mirrors pdf_ocr_inv_to_json.py:360-384: if the first table's keys
    are all positional digits, its first row becomes the header row
    and is applied to the remaining rows; otherwise keys are already
    headers and are whitespace-normalized. ``_table_index`` follows
    :325-331 (_camelot_tables_to_records)."""
    flat: list[dict[str, str]] = []
    for ti, rows in enumerate(tables):
        for r in rows:
            row = {str(k): ("" if v is None else str(v)) for k, v in r.items()}
            row["_table_index"] = str(ti)
            flat.append(row)
    if not flat:
        return []
    first = flat[0]
    numeric_keys = all(k.isdigit() for k in first if k != "_table_index")
    if numeric_keys:
        # width = widest row across ALL tables, not just the header
        # row — a later, wider table must not silently lose columns
        max_idx = max(
            (int(k) for row in flat for k in row if k.isdigit()),
            default=-1,
        )
        headers: list[str] = []
        seen: set[str] = set()
        for i in range(max_idx + 1):
            h = _norm_ws(first.get(str(i), ""))
            name = h if h else f"col_{i + 1}"
            if name in seen:  # duplicate header cells must not collapse
                name = f"{name}_{i + 1}"
            seen.add(name)
            headers.append(name)
        return [
            {
                **{
                    headers[i]: _norm_ws(row.get(str(i), ""))
                    for i in range(len(headers))
                },
                "_table_index": row["_table_index"],
            }
            for row in flat[1:]
        ]
    return [
        {
            **{
                _norm_ws(k): _norm_ws(v)
                for k, v in row.items()
                if k != "_table_index"
            },
            "_table_index": row["_table_index"],
        }
        for row in flat
    ]


def extract_pdf_tables(
    files: DataFrame,
    engine: str = "auto",
    extractors: "dict[str, Callable] | None" = None,
) -> DataFrame:
    """S4: run the table-engine cascade over a binary-file DataFrame.

    ``files`` needs ``path string, content binary`` (what
    ``readers.read_files_with_meta`` / ``binaryFile`` provide).
    ``engine='auto'`` tries the full cascade order; a specific name
    runs only that engine. ``extractors`` overrides the engine
    registry (name → callable) — THE injection point for tests and
    for future engines; the real registry is resolved lazily INSIDE
    the workers so missing libraries never break import.

    Returns TABLE_RECORDS_SCHEMA rows: one per extracted record, with
    ``row_index`` preserving file order (the order column P7's
    trailing-trim and O5's source-order semantics require) and
    ``mode`` recording which engine won (``None`` + null fields row
    when no engine extracted anything, so un-extractable files stay
    visible to the caller, matching run_table's empty-records note).
    """
    known = set(_engines.TABLE_ENGINE_ORDER) | set(extractors or ())
    if engine != "auto" and engine not in known:
        # fail on the DRIVER: deferring to the workers turns a typo
        # into distributed task retries or silent all-null output
        raise ValueError(
            f"unknown table engine {engine!r}; known: "
            f"{sorted(known)} or 'auto'"
        )
    order = (
        _engines.TABLE_ENGINE_ORDER
        if engine == "auto"
        else (engine,)
    )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if extractors is not None:
            resolved = [(n, extractors[n]) for n in order if n in extractors]
            if engine == "auto":  # custom names cascade after the known order
                resolved += [
                    (n, fn) for n, fn in extractors.items() if n not in order
                ]
        else:
            resolved = [
                (n, e)
                for n in order
                for e in [_engines.make_table_engine(n)]
                if e is not None
            ]
        for pdf in batches:
            out: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                tables = None
                won = None
                # null payloads can't be staged to a temp file — the
                # null-fields row below keeps the file visible
                for name, eng in (resolved if content is not None else []):
                    tables = eng(content)
                    if tables:
                        won = f"table-{name}"
                        break
                if not tables:
                    out.append(
                        {
                            "path": path,
                            "mode": None,
                            "table_index": None,
                            "row_index": None,
                            "fields": None,
                        }
                    )
                    continue
                for i, rec in enumerate(normalize_table_records(tables)):
                    ti = int(rec.pop("_table_index"))
                    out.append(
                        {
                            "path": path,
                            "mode": won,
                            "table_index": ti,
                            "row_index": i,
                            "fields": rec,
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in TABLE_RECORDS_SCHEMA]
            )

    return files.select("path", "content").mapInPandas(
        _run, TABLE_RECORDS_SCHEMA
    )
