"""Import-gated extraction engines (S4-S6).

Each factory returns a callable the mapInPandas workers invoke per
file, or ``None`` when the backing library is missing — the cascade
simply skips unavailable engines, mirroring the reference's
``_HAS_CAMELOT`` / ``_HAS_TABULA`` / ``_HAS_OCR`` guards
(pdf_ocr_inv_to_json.py:333-358, pdf_ocr_dbd_to_json.py:45-63,
pdf_ocr_rm_to_json.py:96-115).

Engine contracts (all operate on raw PDF bytes; the worker stages
bytes to a temp file because the native libraries are path-based):

- table engine: ``bytes -> list[list[dict[str, str]]] | None``
  (outer list = tables in document order, inner = rows; None/[] = no
  tables found → cascade advances)
- text engine: ``bytes -> list[str] | None``
  (one string per page; None/[] → cascade advances)
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

TableEngine = Callable[[bytes], "list[list[dict[str, str]]] | None"]
TextEngine = Callable[[bytes], "list[str] | None"]


def _staged(content: bytes, suffix: str = ".pdf"):
    """Write bytes to a temp file, return its path (caller unlinks)."""
    f = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
    f.write(content)
    f.close()
    return f.name


def make_table_engine(name: str) -> TableEngine | None:
    """S4 engines: ``camelot-lattice`` → ``camelot-stream`` → ``tabula``
    (the reference cascade order, pdf_ocr_inv_to_json.py:391-396)."""
    if name in ("camelot-lattice", "camelot-stream"):
        try:
            import camelot  # type: ignore
        except ImportError:
            return None
        flavor = name.split("-", 1)[1]

        def _camelot(content: bytes):
            path = _staged(content)
            try:
                tb = camelot.read_pdf(path, pages="all", flavor=flavor)
                if not tb or tb.n == 0:
                    return None
                return [
                    [
                        {str(k).strip(): ("" if v is None else str(v).strip())
                         for k, v in r.items()}
                        for r in t.df.to_dict(orient="records")
                    ]
                    for t in tb
                ]
            except Exception:
                return None
            finally:
                os.unlink(path)

        return _camelot

    if name == "tabula":
        try:
            import tabula  # type: ignore
        except ImportError:
            return None

        def _tabula(content: bytes):
            path = _staged(content)
            try:
                dfs = tabula.read_pdf(
                    path, pages="all", multiple_tables=True, stream=True
                )
                if not dfs:
                    return None
                return [
                    df.fillna("").astype(str).to_dict(orient="records")
                    for df in dfs
                ]
            except Exception:
                return None
            finally:
                os.unlink(path)

        return _tabula

    raise ValueError(f"unknown table engine {name!r}")


def make_text_engine(name: str) -> TextEngine | None:
    """S5/S6 engines: ``pdfminer`` / ``pypdf`` text layer, ``tesseract``
    OCR (pdf2image @dpi + Tesseract tha+eng --oem 1 --psm 6,
    pdf_ocr_inv_to_json.py:310-320)."""
    if name == "pdfminer":
        try:
            from pdfminer.high_level import extract_pages  # type: ignore
            from pdfminer.layout import LTTextContainer  # type: ignore
        except ImportError:
            return None

        def _pdfminer(content: bytes):
            path = _staged(content)
            try:
                pages = []
                for layout in extract_pages(path):
                    txt = "".join(
                        el.get_text()
                        for el in layout
                        if isinstance(el, LTTextContainer)
                    )
                    pages.append(txt.strip())
                return pages or None
            except Exception:
                return None
            finally:
                os.unlink(path)

        return _pdfminer

    if name == "pypdf":
        try:
            from pypdf import PdfReader  # type: ignore
        except ImportError:
            try:
                from PyPDF2 import PdfReader  # type: ignore
            except ImportError:
                return None
        import io

        def _pypdf(content: bytes):
            try:
                reader = PdfReader(io.BytesIO(content))
                pages = [(p.extract_text() or "").strip() for p in reader.pages]
                return pages or None
            except Exception:
                return None

        return _pypdf

    if name == "tesseract":
        try:
            import pytesseract  # type: ignore
            from pdf2image import convert_from_path  # type: ignore
        except ImportError:
            return None

        def _tesseract(
            content: bytes,
            dpi: int = 300,
            lang: str = "tha+eng",
            config: str = "--oem 1 --psm 6",
        ):
            path = _staged(content)
            try:
                images = convert_from_path(path, dpi=dpi)
                return [
                    (pytesseract.image_to_string(img, lang=lang, config=config) or "")
                    .strip()
                    for img in images
                ] or None
            except Exception:
                return None
            finally:
                os.unlink(path)

        return _tesseract

    raise ValueError(f"unknown text engine {name!r}")


TABLE_ENGINE_ORDER = ("camelot-lattice", "camelot-stream", "tabula")
TEXT_ENGINE_ORDER = ("pdfminer", "pypdf", "tesseract")


def available_table_engines() -> list[str]:
    return [n for n in TABLE_ENGINE_ORDER if make_table_engine(n) is not None]


def available_text_engines() -> list[str]:
    return [n for n in TEXT_ENGINE_ORDER if make_text_engine(n) is not None]
