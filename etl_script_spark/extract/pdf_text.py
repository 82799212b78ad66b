"""S5/S6: distributed PDF text extraction — text layer first, OCR
fallback.

Reference lifecycle (pdf_ocr_dbd_to_json.py:434-456): try the cheap
pdfminer text layer; when it yields nothing (scanned PDFs), fall back
to pdf2image + Tesseract OCR. Page texts get the Thai combining-mark
rejoin (clean_text :89-94 — F17) and arrive as one row per page with
the file's provenance envelope (md5/size, :97-102 — S16).

Spark shape: ``binaryFile`` → ``mapInPandas``; OCR is CPU-heavy, so
at scale repartition to roughly one file per core before calling
(each Tesseract invocation is single-threaded; parallelism comes from
Spark tasks, which is exactly how the reference's per-page subprocess
fan-out generalizes to a cluster).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from etl_script_spark.extract import engines as _engines

PAGE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("file_md5", T.StringType(), True),
        T.StructField("file_size", T.LongType(), True),
        T.StructField("engine", T.StringType(), True),  # text-<eng>|ocr-<eng>|None
        T.StructField("num_pages", T.IntegerType(), True),
        T.StructField("page_number", T.IntegerType(), True),  # 1-based
        T.StructField("text", T.StringType(), True),
    ]
)

_TEXT_LAYER = ("pdfminer", "pypdf")
_OCR = ("tesseract",)


def _clean_text(s: str) -> str:
    """clean_text pdf_ocr_dbd_to_json.py:89-94: rejoin Thai combining
    marks split by a newline, collapse runs of spaces/blank lines."""
    import re

    s = s.replace("\r", "\n")
    s = re.sub(r"(\S)\n([ัิ-ฺ็-๎])", r"\1\2", s)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return s.strip()


def extract_pdf_text(
    files: DataFrame,
    prefer_text_layer: bool = True,
    extractors: "dict[str, Callable] | None" = None,
) -> DataFrame:
    """S5/S6: text-layer → OCR cascade over a binary-file DataFrame.

    ``files`` needs ``path string, content binary``. The cascade is
    text-layer engines (pdfminer → pypdf) then OCR (tesseract) when
    ``prefer_text_layer``; OCR-only otherwise (the rm pipeline's
    scanned remittances go straight to OCR,
    pdf_ocr_rm_to_json.py:96-115). ``extractors`` (name → callable
    bytes→[page texts]) injects fakes for tests and custom engines;
    the real registry resolves lazily inside the workers.

    Output: one row per page (1-based ``page_number``), with file
    md5/size provenance and which engine produced the text. Files no
    engine could read come back as a single null-text row.
    """
    order = (_TEXT_LAYER + _OCR) if prefer_text_layer else _OCR

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if extractors is not None:
            # cascade order first, then any CUSTOM names in insertion
            # order — an injected engine outside the known registry
            # must run, not be silently filtered into all-null rows
            resolved = [(n, extractors[n]) for n in order if n in extractors]
            resolved += [
                (n, fn) for n, fn in extractors.items() if n not in order
            ]
        else:
            resolved = [
                (n, e)
                for n in order
                for e in [_engines.make_text_engine(n)]
                if e is not None
            ]
        for pdf in batches:
            out: list[dict] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                md5 = hashlib.md5(content).hexdigest() if content is not None else None
                size = len(content) if content is not None else None
                pages = None
                won = None
                # a null payload can't be staged to a temp file — emit
                # the null-text envelope row instead of crashing the
                # worker inside the first real engine
                for name, eng in (resolved if content is not None else []):
                    pages = eng(content)
                    # a text layer that is present but EMPTY on every
                    # page means a scanned PDF — keep cascading; a
                    # final OCR engine's successful-but-blank read is
                    # kept (a blank page OCR'd correctly is not a
                    # failure), but a blank TEXT-LAYER read at the end
                    # of the cascade is a scanned PDF we failed to
                    # extract — that falls through to the null-text
                    # envelope so the miss is visible downstream
                    if pages and (
                        any(p.strip() for p in pages)
                        or (name == resolved[-1][0] and name in _OCR)
                    ):
                        won = ("ocr-" if name in _OCR else "text-") + name
                        break
                    pages = None
                if not pages:
                    out.append(
                        {
                            "path": path,
                            "file_md5": md5,
                            "file_size": size,
                            "engine": None,
                            "num_pages": None,
                            "page_number": None,
                            "text": None,
                        }
                    )
                    continue
                for i, txt in enumerate(pages):
                    out.append(
                        {
                            "path": path,
                            "file_md5": md5,
                            "file_size": size,
                            "engine": won,
                            "num_pages": len(pages),
                            "page_number": i + 1,
                            "text": _clean_text(txt),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in PAGE_TEXT_SCHEMA])

    return files.select("path", "content").mapInPandas(_run, PAGE_TEXT_SCHEMA)
