"""Dependency-free legacy ``.xls`` (OLE2/BIFF8) engine for the S2
cascade (SURVEY.md §2.1 S2; reference: script_read_dbd_balance.py:
98-150 reads per-company ``.xls`` downloads through pandas/xlrd).

The container has no xlrd/calamine, so this module implements the
minimal public file formats from scratch:

* **CFB** (Compound File Binary, MS-CFB): header → DIFAT → FAT →
  directory tree → the ``Workbook``/``Book`` stream, including the
  mini-stream path for streams under the 4096-byte cutoff.
* **BIFF8** (MS-XLS): globals substream (SST with CONTINUE-record
  string splitting, BOUNDSHEET) and per-sheet cell records (NUMBER,
  RK, MULRK, LABELSST, LABEL, BOOLERR, FORMULA cached results +
  STRING).

Output matches ``parse_xlsx_stdlib``: stored literals as strings —
numbers keep an int-if-integral lexical form and DATE cells stay
Excel serials, which is exactly what F2 ``excel_serial_to_date``
consumes downstream.

``write_xls_simple`` is fixture tooling (tests / catalog queries):
a minimal single-sheet BIFF8 workbook in a minimal CFB container.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


# --------------------------------------------------------------------
# CFB container
# --------------------------------------------------------------------


def cfb_open_stream(payload: bytes, names=("Workbook", "Book")) -> bytes:
    """Return the bytes of the first directory stream whose name is in
    ``names`` (the BIFF workbook stream)."""
    if payload[:8] != _CFB_MAGIC:
        raise ValueError("not a CFB (OLE2) file")
    sec_shift = struct.unpack_from("<H", payload, 30)[0]
    mini_shift = struct.unpack_from("<H", payload, 32)[0]
    dir_start = struct.unpack_from("<I", payload, 48)[0]
    mini_cutoff = struct.unpack_from("<I", payload, 56)[0]
    minifat_start = struct.unpack_from("<I", payload, 60)[0]
    difat_start = struct.unpack_from("<I", payload, 68)[0]
    n_difat = struct.unpack_from("<I", payload, 72)[0]
    ssz = 1 << sec_shift

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        if off >= len(payload):
            raise ValueError(f"sector {i} out of range")
        return payload[off : off + ssz]

    difat = [x for x in struct.unpack_from("<109I", payload, 76)]
    s = difat_start
    for _ in range(n_difat):
        if s in (_ENDCHAIN, _FREE):
            break
        ents = struct.unpack(f"<{ssz // 4}I", sector(s))
        difat.extend(ents[:-1])
        s = ents[-1]

    fat: list[int] = []
    for fs in difat:
        if fs in (_FREE, _ENDCHAIN):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def chain(start: int) -> bytes:
        out = bytearray()
        s, seen = start, set()
        while s not in (_ENDCHAIN, _FREE):
            if s in seen or s >= len(fat):
                raise ValueError("corrupt FAT chain")
            seen.add(s)
            out += sector(s)
            s = fat[s]
        return bytes(out)

    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata), 128):
        e = dirdata[off : off + 128]
        if len(e) < 128:
            break
        nlen = struct.unpack_from("<H", e, 64)[0]
        if nlen < 2:
            continue
        name = e[: nlen - 2].decode("utf-16-le", errors="replace")
        typ = e[66]
        start = struct.unpack_from("<I", e, 116)[0]
        size = struct.unpack_from("<Q", e, 120)[0] & 0xFFFFFFFF
        entries.append((name, typ, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise ValueError("no root directory entry")
    mini_container = chain(root[2])[: root[3]] if root[3] else b""
    minifat: list[int] = []
    if minifat_start not in (_ENDCHAIN, _FREE):
        mdata = chain(minifat_start)
        minifat = list(struct.unpack(f"<{len(mdata) // 4}I", mdata))
    msz = 1 << mini_shift

    def mini_chain(start: int, size: int) -> bytes:
        out = bytearray()
        s, seen = start, set()
        while s not in (_ENDCHAIN, _FREE):
            if s in seen or s >= len(minifat):
                raise ValueError("corrupt miniFAT chain")
            seen.add(s)
            out += mini_container[s * msz : (s + 1) * msz]
            s = minifat[s]
        return bytes(out[:size])

    for want in names:
        for name, typ, start, size in entries:
            if typ == 2 and name == want:
                if size < mini_cutoff:
                    return mini_chain(start, size)
                return chain(start)[:size]
    raise ValueError(f"no stream named any of {names}")


# --------------------------------------------------------------------
# BIFF8 primitives
# --------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABELSST = 0x00FD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207


def _iter_records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, op, stream[pos + 4 : pos + 4 + ln]
        pos += 4 + ln


def _decode_rk(v: int) -> float:
    """RK number: bit0 = value×100 stored, bit1 = 30-bit int vs
    truncated IEEE double high bits."""
    cents = v & 1
    if v & 2:
        x = v >> 2
        if x & 0x20000000:
            x -= 0x40000000
        val = float(x)
    else:
        val = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", v & 0xFFFFFFFC))[0]
    return val / 100.0 if cents else val


def _fmt_num(v: float) -> str:
    """Stored literal shape: int-if-integral (45000.0 → '45000'),
    matching the stdlib xlsx engine's raw-literal contract."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return str(v)


class _Chunks:
    """Cursor over a record's data plus its CONTINUE follow-ons.

    BIFF8 splits SST string DATA across CONTINUE records; at each
    split the next chunk restarts with a fresh grbit byte (the
    compressed/16-bit flag may change mid-string). Fixed-width fields
    may also straddle a boundary — ``take`` handles that; ``chars``
    implements the grbit-restart rule."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.chunks[self.ci]) - self.off

    def _advance(self) -> None:
        while self.ci < len(self.chunks) and self._avail() == 0:
            self.ci += 1
            self.off = 0

    def take(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._advance()
            got = self.chunks[self.ci][self.off : self.off + min(n, self._avail())]
            out += got
            self.off += len(got)
            n -= len(got)
        return bytes(out)

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def chars(self, cch: int, high: bool) -> str:
        """Read ``cch`` characters, re-reading the grbit byte at each
        CONTINUE boundary (MS-XLS 2.5.293 ContinuedString)."""
        parts: list[str] = []
        remaining = cch
        while remaining:
            self._advance()
            width = 2 if high else 1
            n = min(remaining, self._avail() // width)
            if n == 0:
                # char data never splits inside a 16-bit unit; a zero
                # here means the boundary is exactly at offset → next
                # chunk restarts with its own grbit
                self.ci += 1
                self.off = 0
                high = bool(self.chunks[self.ci][0] & 1)
                self.off = 1
                continue
            raw = self.take(n * width)
            parts.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= n
            if remaining:
                self._advance()
                high = bool(self.u8() & 1)
        return "".join(parts)


def _read_xl_string(cur: _Chunks, short: bool = False) -> str:
    """XLUnicodeString: cch (1 or 2 bytes), grbit, optional rich/ext
    lengths, character data, then the rich runs / ext block skipped."""
    cch = cur.u8() if short else cur.u16()
    grbit = cur.u8()
    crun = cur.u16() if grbit & 0x08 else 0
    cbext = cur.u32() if grbit & 0x04 else 0
    s = cur.chars(cch, bool(grbit & 0x01))
    if crun:
        cur.take(4 * crun)
    if cbext:
        cur.take(cbext)
    return s


def parse_sst(chunks: list[bytes]) -> list[str]:
    """SST record data + CONTINUE datas → shared-string table."""
    cur = _Chunks(chunks)
    cur.u32()  # total refs
    cnt = cur.u32()
    return [_read_xl_string(cur) for _ in range(cnt)]


# --------------------------------------------------------------------
# Workbook parse
# --------------------------------------------------------------------


def parse_xls_stdlib(payload: bytes, header: "int | None" = 0):
    """Dependency-free ``.xls`` parse → ``[(sheet_name,
    pandas.DataFrame)]``, the BIFF8 twin of ``parse_xlsx_stdlib``
    (same header promotion, same string-literal value contract)."""
    import pandas as pd

    stream = cfb_open_stream(payload)

    # ---- globals substream: SST + sheet directory
    shared: list[str] = []
    sheets: list[tuple[str, int]] = []
    sst_chunks: list[bytes] | None = None
    for pos, op, data in _iter_records(stream):
        if op == _SST:
            sst_chunks = [data]
        elif op == _CONTINUE and sst_chunks is not None:
            sst_chunks.append(data)
        elif op != _CONTINUE and sst_chunks is not None and op != _SST:
            shared = parse_sst(sst_chunks)
            sst_chunks = None
        if op == _BOUNDSHEET:
            bof_pos = struct.unpack_from("<I", data, 0)[0]
            cur = _Chunks([data[6:]])
            name = _read_xl_string(cur, short=True)
            sheets.append((name, bof_pos))
        elif op == _EOF:
            break
    if sst_chunks is not None:
        shared = parse_sst(sst_chunks)

    out = []
    for name, bof_pos in sheets:
        grid: dict[int, dict[int, str]] = {}
        max_col = -1

        def put(r: int, c: int, v: "str | None") -> None:
            nonlocal max_col
            if v is None:
                return
            grid.setdefault(r, {})[c] = v
            max_col = max(max_col, c)

        pending_string: "tuple[int, int] | None" = None
        for pos, op, data in _iter_records(stream, bof_pos):
            if pos == bof_pos:
                if op != _BOF:
                    raise ValueError("BOUNDSHEET does not point at a BOF")
                continue
            if op == _EOF:
                break
            if op == _NUMBER:
                r, c = struct.unpack_from("<HH", data, 0)
                put(r, c, _fmt_num(struct.unpack_from("<d", data, 6)[0]))
            elif op == _RK:
                r, c = struct.unpack_from("<HH", data, 0)
                put(r, c, _fmt_num(_decode_rk(struct.unpack_from("<I", data, 6)[0])))
            elif op == _MULRK:
                r, c0 = struct.unpack_from("<HH", data, 0)
                n = (len(data) - 6) // 6
                for i in range(n):
                    rk = struct.unpack_from("<I", data, 4 + i * 6 + 2)[0]
                    put(r, c0 + i, _fmt_num(_decode_rk(rk)))
            elif op == _LABELSST:
                r, c = struct.unpack_from("<HH", data, 0)
                idx = struct.unpack_from("<I", data, 6)[0]
                put(r, c, shared[idx] if idx < len(shared) else None)
            elif op == _LABEL:
                r, c = struct.unpack_from("<HH", data, 0)
                put(r, c, _read_xl_string(_Chunks([data[6:]])))
            elif op == _BOOLERR:
                r, c = struct.unpack_from("<HH", data, 0)
                val, is_err = data[6], data[7]
                if not is_err:
                    put(r, c, "True" if val else "False")
            elif op == _FORMULA:
                r, c = struct.unpack_from("<HH", data, 0)
                res = data[6:14]
                if res[6:8] == b"\xff\xff":
                    if res[0] == 0:  # string result in next STRING rec
                        pending_string = (r, c)
                    elif res[0] == 1:
                        put(r, c, "True" if res[2] else "False")
                    # err (2) / empty (3): leave the cell empty
                else:
                    put(r, c, _fmt_num(struct.unpack("<d", res)[0]))
            elif op == _STRING and pending_string is not None:
                r, c = pending_string
                pending_string = None
                put(r, c, _read_xl_string(_Chunks([data])))

        if not grid:
            continue
        n_rows = max(grid) + 1
        rows = [
            [grid.get(r, {}).get(c) for c in range(max_col + 1)]
            for r in range(n_rows)
        ]
        if header is not None and rows:
            cols = [
                rows[header][i] if rows[header][i] is not None else f"col_{i}"
                for i in range(max_col + 1)
            ]
            pdf = pd.DataFrame(rows[header + 1 :], columns=cols)
        else:
            pdf = pd.DataFrame(rows)
        out.append((name, pdf))
    return out


# --------------------------------------------------------------------
# Minimal writer (fixture tooling — single sheet, no CONTINUE)
# --------------------------------------------------------------------


def _rec(op: int, data: bytes) -> bytes:
    return struct.pack("<HH", op, len(data)) + data


def write_xls_simple(rows: "list[list]", path: str, sheet: str = "Sheet1") -> None:
    """Minimal BIFF8 ``.xls`` writer: numbers as NUMBER records,
    strings via SST/LABELSST (16-bit chars, so Thai round-trips),
    bools as BOOLERR. Fixture tooling for tests and catalog queries;
    NOT a general sink."""
    strings: list[str] = []
    sidx: dict[str, int] = {}
    cells = b""
    nrefs = 0
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                cells += _rec(_BOOLERR, struct.pack("<HHHBB", r, c, 15, int(v), 0))
            elif isinstance(v, (int, float)):
                cells += _rec(
                    _NUMBER, struct.pack("<HHH", r, c, 15) + struct.pack("<d", float(v))
                )
            else:
                s = str(v)
                if s not in sidx:
                    sidx[s] = len(strings)
                    strings.append(s)
                nrefs += 1
                cells += _rec(_LABELSST, struct.pack("<HHHI", r, c, 15, sidx[s]))

    def bof(dt: int) -> bytes:
        return _rec(_BOF, struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 1, 0x0600))

    sheet_stream = bof(0x0010) + cells + _rec(_EOF, b"")

    sst_data = struct.pack("<II", nrefs, len(strings))
    for s in strings:
        sst_data += struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")
    sst = _rec(_SST, sst_data)
    codepage = _rec(0x0042, struct.pack("<H", 1200))
    name_enc = sheet.encode("latin-1")
    bs_data = struct.pack("<IBB", 0, 0, 0) + struct.pack("<BB", len(name_enc), 0) + name_enc
    globals_len = len(bof(0x0005)) + len(codepage) + 4 + len(bs_data) + len(sst) + 4
    bs = _rec(
        _BOUNDSHEET,
        struct.pack("<IBB", globals_len, 0, 0)
        + struct.pack("<BB", len(name_enc), 0)
        + name_enc,
    )
    workbook = bof(0x0005) + codepage + bs + sst + _rec(_EOF, b"") + sheet_stream

    # keep the stream out of the mini-stream (cutoff 4096) so the CFB
    # wrapper needs no miniFAT: pad with one skipped unknown record
    if len(workbook) < 4096:
        workbook += _rec(0x0897, b"\x00" * (4096 - len(workbook) - 4))

    with open(path, "wb") as f:
        f.write(_cfb_wrap(workbook))


def _dir_entry(name: str, typ: int, start: int, size: int, child: int = _FREE) -> bytes:
    enc = (name + "\x00").encode("utf-16-le")
    e = bytearray(128)
    e[: len(enc)] = enc
    struct.pack_into("<H", e, 64, len(enc))
    e[66] = typ
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, _FREE, _FREE, child)  # left/right/child
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _cfb_wrap(stream_bytes: bytes) -> bytes:
    """Wrap one ≥4096-byte stream as ``Workbook`` in a minimal v3 CFB:
    sector 0 = FAT, sector 1 = directory, sectors 2+ = stream data."""
    data = stream_bytes + b"\x00" * (-len(stream_bytes) % 512)
    n_data = len(data) // 512
    if n_data + 2 > 128:
        raise ValueError("fixture writer supports one FAT sector (~63 KiB)")
    fat = [_FATSECT, _ENDCHAIN]  # sector 0 (FAT itself), sector 1 (dir)
    fat += [(3 + i) if i < n_data - 1 else _ENDCHAIN for i in range(n_data)]
    fat += [_FREE] * (128 - len(fat))
    fat_sec = struct.pack("<128I", *fat)

    dir_sec = (
        _dir_entry("Root Entry", 5, _ENDCHAIN, 0, child=1)
        + _dir_entry("Workbook", 2, 2, len(stream_bytes))
        + b"\x00" * 256
    )

    h = bytearray(512)
    h[:8] = _CFB_MAGIC
    struct.pack_into("<H", h, 24, 0x003E)  # minor
    struct.pack_into("<H", h, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", h, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", h, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", h, 32, 6)  # 64-byte mini sectors
    struct.pack_into("<I", h, 44, 1)  # one FAT sector
    struct.pack_into("<I", h, 48, 1)  # directory at sector 1
    struct.pack_into("<I", h, 56, 4096)  # mini cutoff
    struct.pack_into("<I", h, 60, _ENDCHAIN)  # no miniFAT
    struct.pack_into("<I", h, 64, 0)
    struct.pack_into("<I", h, 68, _ENDCHAIN)  # no extra DIFAT
    struct.pack_into("<I", h, 72, 0)
    struct.pack_into("<I", h, 76, 0)  # DIFAT[0] → FAT sector 0
    for i in range(1, 109):
        struct.pack_into("<I", h, 76 + i * 4, _FREE)

    return bytes(h) + fat_sec + dir_sec + data
