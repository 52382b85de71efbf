"""Legacy .xls (BIFF8) parsing: a handcrafted OLE2+BIFF fixture exercises the
compound-file reader, the SST (including a CONTINUE split mid-string), and
the cell record decoders."""

import struct
from pathlib import Path

import pytest

from voitta_rag_tpu.services.parsers.xls_biff import (
    _decode_rk, _parse_sst, parse_xls,
)

FREE = 0xFFFFFFFF
END = 0xFFFFFFFE


def rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def biff8_string(s: str) -> bytes:
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")


def build_workbook_stream(strings, cells_by_sheet):
    """Minimal BIFF8: globals (BOF, SST, BOUNDSHEETs, EOF) + sheet substreams.

    cells_by_sheet: {name: [record bytes]}.
    """
    sst_payload = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        sst_payload += biff8_string(s)

    globals_recs = [rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0)),
                    rec(0x00FC, sst_payload)]
    # BOUNDSHEET offsets patched after layout: build with placeholders.
    names = list(cells_by_sheet)
    bs_payloads = []
    for name in names:
        bs_payloads.append(struct.pack("<IHBB", 0, 0, len(name), 0)
                           + name.encode("latin-1"))
    globals_recs += [rec(0x0085, p) for p in bs_payloads]
    globals_recs.append(rec(0x000A, b""))
    globals_blob = b"".join(globals_recs)

    sheet_blobs = []
    for name in names:
        body = [rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0010, 0, 0))]
        body += cells_by_sheet[name]
        body.append(rec(0x000A, b""))
        sheet_blobs.append(b"".join(body))

    # Patch BOUNDSHEET stream offsets.
    offsets = []
    pos = len(globals_blob)
    for blob in sheet_blobs:
        offsets.append(pos)
        pos += len(blob)
    out = bytearray(globals_blob)
    cursor = 0
    # find each BOUNDSHEET record and patch its first 4 bytes
    i = 0
    si = 0
    while i < len(out) - 4:
        op, ln = struct.unpack_from("<HH", out, i)
        if op == 0x0085:
            struct.pack_into("<I", out, i + 4, offsets[si])
            si += 1
        i += 4 + ln
    return bytes(out) + b"".join(sheet_blobs)


def build_ole(stream: bytes) -> bytes:
    """Single-FAT-sector OLE2 container holding one 'Workbook' stream."""
    ssz = 512
    stream = stream + b"\0" * max(0, 4096 - len(stream))  # avoid mini stream
    n_stream_sectors = -(-len(stream) // ssz)
    stream = stream + b"\0" * (n_stream_sectors * ssz - len(stream))

    # Sectors: 0 = FAT, 1 = directory, 2.. = stream
    fat = [0xFFFFFFFD, END] + [2 + i + 1 for i in range(n_stream_sectors)]
    fat[-1] = END
    fat += [FREE] * (128 - len(fat))
    fat_sector = struct.pack("<128I", *fat)

    def dirent(name, etype, start, size):
        n16 = name.encode("utf-16-le") + b"\0\0"
        ent = n16 + b"\0" * (64 - len(n16))
        ent += struct.pack("<H", len(n16))
        ent += bytes([etype, 0])  # type, color
        ent += struct.pack("<III", FREE, FREE, FREE)  # left/right/child
        ent += b"\0" * 16 + b"\0" * 4 + b"\0" * 16  # clsid, state, times
        ent += struct.pack("<II", start, size)
        ent += b"\0" * (128 - len(ent))
        return ent[:128]

    directory = (dirent("Root Entry", 5, END, 0)
                 + dirent("Workbook", 2, 2, len(stream)))
    directory += b"\0" * (ssz - len(directory) % ssz if len(directory) % ssz
                          else 0)

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 26, 0x003E)   # minor version
    struct.pack_into("<H", header, 28, 0x0003)   # major version
    struct.pack_into("<H", header, 24, 0xFFFE)   # byte order... (position 28?)
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini sector shift
    struct.pack_into("<I", header, 44, 1)        # num FAT sectors
    struct.pack_into("<I", header, 48, 1)        # first directory sector
    struct.pack_into("<I", header, 56, 4096)     # mini stream cutoff
    struct.pack_into("<I", header, 60, END)      # first miniFAT
    struct.pack_into("<I", header, 64, 0)        # num miniFAT
    struct.pack_into("<I", header, 68, END)      # first DIFAT
    struct.pack_into("<I", header, 72, 0)        # num DIFAT
    difat = [0] + [FREE] * 108                   # FAT sector 0
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + fat_sector + directory + stream


@pytest.fixture
def xls_bytes():
    def labelsst(r, c, isst):
        return rec(0x00FD, struct.pack("<HHHI", r, c, 0, isst))

    def number(r, c, v):
        return rec(0x0203, struct.pack("<HHHd", r, c, 0, v))

    def rk_int(r, c, v):
        return rec(0x027E, struct.pack("<HHHI", r, c, 0, (v << 2) | 2))

    sheet1 = [labelsst(0, 0, 0), labelsst(0, 1, 1),
              labelsst(1, 0, 2), number(1, 1, 3.5),
              rk_int(2, 0, 42),
              rec(0x0205, struct.pack("<HHHBB", 2, 1, 0, 1, 0))]  # TRUE
    sheet2 = [labelsst(0, 0, 0)]
    stream = build_workbook_stream(
        ["Name", "Value", "quarterly revenue"],
        {"Summary": sheet1, "Notes": sheet2})
    return build_ole(stream)


def test_parse_xls_cells_and_sheets(xls_bytes):
    sheets = parse_xls(xls_bytes)
    assert [name for name, _ in sheets] == ["Summary", "Notes"]
    rows = sheets[0][1]
    assert rows[0] == ["Name", "Value"]
    assert rows[1] == ["quarterly revenue", "3.5"]
    assert rows[2] == ["42", "TRUE"]
    assert sheets[1][1] == [["Name"]]


def test_xls_via_parser_registry(tmp_path, xls_bytes):
    from voitta_rag_tpu.services.parsers.office_parser import XlsxParser

    p = tmp_path / "report.xls"
    p.write_bytes(xls_bytes)
    result = XlsxParser().parse(p)
    assert result.success, result.error
    assert "## Summary" in result.content
    assert "| quarterly revenue | 3.5 |" in result.content
    assert "## Notes" in result.content


def test_sst_continue_split_mid_string():
    # String of 10 chars: 4 in the SST record, 6 in a CONTINUE that restarts
    # with its own option-flags byte (wide this time).
    head = struct.pack("<II", 1, 1) + struct.pack("<HB", 10, 0) + b"abcd"
    cont = bytes([1]) + "efghij".encode("utf-16-le")
    assert _parse_sst([head, cont]) == ["abcdefghij"]


def test_sst_rich_text_runs_skipped():
    payload = struct.pack("<II", 2, 2)
    payload += struct.pack("<HBH", 2, 8, 1) + b"hi" + b"\0\0\0\0"  # 1 run
    payload += struct.pack("<HB", 3, 0) + b"bye"
    assert _parse_sst([payload]) == ["hi", "bye"]


def test_decode_rk():
    assert _decode_rk((42 << 2) | 2) == 42.0
    assert _decode_rk((4242 << 2) | 3) == pytest.approx(42.42)
    neg = ((-7) & ((1 << 30) - 1)) << 2 | 2
    assert _decode_rk(neg) == -7.0
    bits = struct.unpack("<I", struct.pack("<d", 2.5)[4:])[0] & 0xFFFFFFFC
    assert _decode_rk(bits) == 2.5


def test_truncated_xls_fails_gracefully(tmp_path):
    from voitta_rag_tpu.services.parsers.office_parser import XlsxParser

    p = tmp_path / "junk.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 100)
    result = XlsxParser().parse(p)
    assert not result.success
