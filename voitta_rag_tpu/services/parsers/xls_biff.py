"""Legacy ``.xls`` (BIFF) workbook reader, from the published file formats.

The reference parses ``.xls`` through the xlrd package
(reference services/parsers/xlsx_parser.py:226); xlrd is not in this image,
so this is a minimal clean-room implementation of the two published
specifications involved:

- **OLE2 / Compound File Binary** (MS-CFB): sector FAT chains, directory
  entries, the mini-stream for small streams — enough to locate and read the
  ``Workbook``/``Book`` stream.
- **BIFF8/BIFF5** (MS-XLS): the record stream inside it — BOUNDSHEET sheet
  directory, the shared string table (SST with CONTINUE splits), and the
  cell records (LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR / FORMULA
  cached results).

Output: ``[(sheet_name, rows)]`` with rows as lists of cell strings —
feeding the same markdown-table rendering as the XLSX path. Formatting
(dates, colors) is intentionally ignored: the goal is text extraction for
indexing, numbers render as their raw values.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE


# ---------------------------------------------------------------------------
# OLE2 compound file
# ---------------------------------------------------------------------------

def _read_stream(data: bytes, name_options: tuple[str, ...]) -> bytes:
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    ssz = 1 << sector_shift
    mssz = 1 << mini_shift
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off:off + ssz]

    # FAT sector list: 109 DIFAT entries in the header + DIFAT chain.
    fat_sectors = list(struct.unpack_from("<109I", data, 76))
    di = first_difat
    for _ in range(n_difat):
        if di in (_FREE, _ENDCHAIN):
            break
        blk = sector(di)
        entries = struct.unpack(f"<{ssz // 4}I", blk)
        fat_sectors.extend(entries[:-1])
        di = entries[-1]
    fat: list[int] = []
    for fs in fat_sectors:
        if fs == _FREE:
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def chain(start: int, limit: int | None = None) -> bytes:
        out = bytearray()
        s = start
        seen = 0
        while s not in (_FREE, _ENDCHAIN) and s < len(fat):
            out += sector(s)
            s = fat[s]
            seen += 1
            if seen > len(fat) + 1:
                raise ValueError("FAT chain loop")
        return bytes(out[:limit] if limit else out)

    # Directory entries (128 bytes each).
    dir_data = chain(first_dir)
    entries = []
    for off in range(0, len(dir_data) - 127, 128):
        name_len = struct.unpack_from("<H", dir_data, off + 64)[0]
        if name_len < 2:
            continue
        name = dir_data[off:off + name_len - 2].decode("utf-16-le",
                                                       errors="ignore")
        etype = dir_data[off + 66]
        start = struct.unpack_from("<I", dir_data, off + 116)[0]
        size = struct.unpack_from("<I", dir_data, off + 120)[0]
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    target = None
    for opt in name_options:
        target = next((e for e in entries if e[0] == opt and e[1] == 2), None)
        if target:
            break
    if target is None:
        raise ValueError("no Workbook stream in compound file")
    _, _, start, size = target

    if size >= mini_cutoff:
        return chain(start, size)

    # Small stream: read from the mini stream via the mini FAT.
    mini_stream = chain(root[2]) if root else b""
    minifat: list[int] = []
    mf = first_minifat
    for _ in range(n_minifat):
        if mf in (_FREE, _ENDCHAIN):
            break
        minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(mf)))
        mf = fat[mf] if mf < len(fat) else _ENDCHAIN
    out = bytearray()
    s = start
    while s not in (_FREE, _ENDCHAIN) and s < len(minifat):
        out += mini_stream[s * mssz:(s + 1) * mssz]
        s = minifat[s]
    return bytes(out[:size])


# ---------------------------------------------------------------------------
# BIFF record stream
# ---------------------------------------------------------------------------

def _records(stream: bytes):
    pos = 0
    n = len(stream)
    while pos + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, pos)
        yield pos, op, stream[pos + 4:pos + 4 + ln]
        pos += 4 + ln


def _decode_rk(rk: int) -> float:
    div100 = rk & 1
    as_int = rk & 2
    if as_int:
        # Sign-extend the 30-bit integer.
        v = float((rk >> 2) - (1 << 30) if (rk >> 2) & (1 << 29) else rk >> 2)
    else:
        v = struct.unpack("<d", b"\0\0\0\0" + struct.pack(
            "<I", rk & 0xFFFFFFFC))[0]
    return v / 100.0 if div100 else v


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


class _SSTCursor:
    """Cursor over the SST payload + CONTINUE payloads.

    Header fields read as raw bytes (writers do not split fixed fields);
    character data re-reads a fresh option-flags byte whenever it continues
    into a new CONTINUE record (MS-XLS §2.5.293 string continuation rule).
    """

    def __init__(self, parts: list[bytes]):
        self.parts = parts
        self.pi = 0
        self.off = 0

    def _advance_part(self) -> None:
        self.pi += 1
        self.off = 0

    def eof(self) -> bool:
        pi, off = self.pi, self.off
        while pi < len(self.parts) and off >= len(self.parts[pi]):
            pi += 1
            off = 0
        return pi >= len(self.parts)

    def read(self, n: int) -> bytes:
        """Raw bytes, spanning parts with no grbit re-read (header fields)."""
        out = bytearray()
        while n > 0:
            if self.off >= len(self.parts[self.pi]):
                self._advance_part()
                continue
            take = min(n, len(self.parts[self.pi]) - self.off)
            out += self.parts[self.pi][self.off:self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_u8(self) -> int:
        return self.read(1)[0]

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def read_chars(self, cch: int, wide: bool) -> str:
        out = []
        remaining = cch
        while remaining > 0:
            if self.off >= len(self.parts[self.pi]):
                self._advance_part()
                # Continuation restarts with a fresh option-flags byte.
                wide = bool(self.read_u8() & 1)
                continue
            data = self.parts[self.pi]
            avail = len(data) - self.off
            if wide:
                take = min(remaining, avail // 2)
                if take == 0:
                    break  # malformed: odd trailing byte
                out.append(data[self.off:self.off + take * 2].decode(
                    "utf-16-le", errors="replace"))
                self.off += take * 2
            else:
                take = min(remaining, avail)
                out.append(data[self.off:self.off + take].decode("latin-1"))
                self.off += take
            remaining -= take
        return "".join(out)


def _parse_sst(payloads: list[bytes]) -> list[str]:
    """Shared string table: header (total, unique), then unique XLUnicode
    strings with optional rich-text runs and phonetic blocks, split across
    CONTINUE records."""
    if not payloads or len(payloads[0]) < 8:
        return []
    n_unique = struct.unpack_from("<I", payloads[0], 4)[0]
    cur = _SSTCursor(payloads)
    cur.off = 8  # skip cstTotal + cstUnique
    strings: list[str] = []
    for _ in range(n_unique):
        if cur.eof():
            break
        cch = cur.read_u16()
        flags = cur.read_u8()
        crun = cur.read_u16() if flags & 8 else 0
        cbext = cur.read_u32() if flags & 4 else 0
        strings.append(cur.read_chars(cch, bool(flags & 1)))
        cur.read(crun * 4 + cbext)  # rich-text runs + phonetic block
    return strings


def parse_xls(data: bytes) -> list[tuple[str, list[list[str]]]]:
    """Extract ``[(sheet_name, rows)]`` from a legacy .xls workbook."""
    stream = _read_stream(data, ("Workbook", "Book"))

    # Pass 1 over the workbook-globals substream: sheet directory + SST.
    sheets: list[tuple[int, str]] = []   # (stream_offset, name)
    sst_payloads: list[bytes] = []
    collecting_sst = False
    biff5 = False
    for pos, op, payload in _records(stream):
        if op == 0x0809 and len(payload) >= 4:  # BOF
            vers = struct.unpack_from("<H", payload, 0)[0]
            if vers and vers < 0x0600:
                biff5 = True
        if op == 0x0085:  # BOUNDSHEET
            sheet_off = struct.unpack_from("<I", payload, 0)[0]
            if biff5:
                ln = payload[6]
                name = payload[7:7 + ln].decode("latin-1", errors="replace")
            else:
                ln = payload[6]
                grbit = payload[7]
                if grbit & 1:
                    name = payload[8:8 + ln * 2].decode("utf-16-le",
                                                        errors="replace")
                else:
                    name = payload[8:8 + ln].decode("latin-1",
                                                    errors="replace")
            sheets.append((sheet_off, name))
            collecting_sst = False
        elif op == 0x00FC:  # SST
            sst_payloads = [payload]
            collecting_sst = True
        elif op == 0x003C and collecting_sst:  # CONTINUE
            sst_payloads.append(payload)
        elif op not in (0x00FC, 0x003C):
            collecting_sst = False

    try:
        sst = _parse_sst(sst_payloads)
    except Exception:
        sst = []

    out = []
    for sheet_off, name in sheets:
        cells: dict[tuple[int, int], str] = {}
        pending_formula_cell: tuple[int, int] | None = None
        for pos, op, payload in _records(stream[sheet_off:]):
            if op == 0x000A:  # EOF of this substream
                break
            try:
                if op == 0x00FD and len(payload) >= 10:  # LABELSST
                    r, c, _, isst = struct.unpack_from("<HHHI", payload, 0)
                    if isst < len(sst):
                        cells[(r, c)] = sst[isst]
                elif op in (0x0204, 0x0004) and len(payload) >= 8:  # LABEL
                    r, c = struct.unpack_from("<HH", payload, 0)
                    if biff5 or op == 0x0004:
                        ln = struct.unpack_from("<H", payload, 6)[0]
                        cells[(r, c)] = payload[8:8 + ln].decode(
                            "latin-1", errors="replace")
                    else:
                        ln = struct.unpack_from("<H", payload, 6)[0]
                        grbit = payload[8]
                        if grbit & 1:
                            cells[(r, c)] = payload[9:9 + ln * 2].decode(
                                "utf-16-le", errors="replace")
                        else:
                            cells[(r, c)] = payload[9:9 + ln].decode(
                                "latin-1", errors="replace")
                elif op == 0x0203 and len(payload) >= 14:  # NUMBER
                    r, c = struct.unpack_from("<HH", payload, 0)
                    v = struct.unpack_from("<d", payload, 6)[0]
                    cells[(r, c)] = _fmt_num(v)
                elif op == 0x027E and len(payload) >= 10:  # RK
                    r, c = struct.unpack_from("<HH", payload, 0)
                    rk = struct.unpack_from("<I", payload, 6)[0]
                    cells[(r, c)] = _fmt_num(_decode_rk(rk))
                elif op == 0x00BD:  # MULRK
                    r, c0 = struct.unpack_from("<HH", payload, 0)
                    n_rk = (len(payload) - 6) // 6
                    for i in range(n_rk):
                        rk = struct.unpack_from("<I", payload,
                                                4 + i * 6 + 2)[0]
                        cells[(r, c0 + i)] = _fmt_num(_decode_rk(rk))
                elif op == 0x0205 and len(payload) >= 8:  # BOOLERR
                    r, c = struct.unpack_from("<HH", payload, 0)
                    val, is_err = payload[6], payload[7]
                    if not is_err:
                        cells[(r, c)] = "TRUE" if val else "FALSE"
                elif op == 0x0006 and len(payload) >= 14:  # FORMULA
                    r, c = struct.unpack_from("<HH", payload, 0)
                    res = payload[6:14]
                    if res[6:8] == b"\xff\xff":
                        if res[0] == 0:      # string result follows (STRING)
                            pending_formula_cell = (r, c)
                        elif res[0] == 1:    # boolean
                            cells[(r, c)] = "TRUE" if res[2] else "FALSE"
                    else:
                        v = struct.unpack("<d", res)[0]
                        cells[(r, c)] = _fmt_num(v)
                elif op == 0x0207 and pending_formula_cell:  # STRING
                    cch = struct.unpack_from("<H", payload, 0)[0]
                    grbit = payload[2] if len(payload) > 2 else 0
                    if grbit & 1:
                        s = payload[3:3 + cch * 2].decode(
                            "utf-16-le", errors="replace")
                    else:
                        s = payload[3:3 + cch].decode("latin-1",
                                                      errors="replace")
                    cells[pending_formula_cell] = s
                    pending_formula_cell = None
            except (struct.error, IndexError):
                continue
        if not cells:
            out.append((name, []))
            continue
        max_r = max(r for r, _ in cells)
        max_c = max(c for _, c in cells)
        rows = [[cells.get((r, c), "") for c in range(max_c + 1)]
                for r in range(max_r + 1)]
        rows = [row for row in rows if any(x != "" for x in row)]
        out.append((name, rows))
    return out
