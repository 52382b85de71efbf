#!/usr/bin/env python3
"""Disaster recovery: rebuild the SQLite ``indexed_files`` table from the
index payload store (reference scripts/sync_qdrant_stats.py:29-159 —
rebuild SQLite from a full Qdrant scroll)."""

from __future__ import annotations

import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

import sys
from collections import defaultdict


def main() -> int:
    from voitta_rag_tpu.db.database import get_db, init_db
    from voitta_rag_tpu.db.models import IndexedFile
    from voitta_rag_tpu.index.store import get_vector_store
    from voitta_rag_tpu.services.indexing import compute_file_hash
    from voitta_rag_tpu.config import get_settings

    init_db()
    db = get_db()
    store = get_vector_store()
    payloads = store.payloads

    per_file: dict[str, dict] = defaultdict(lambda: {"count": 0})
    rows = payloads._conn.execute(
        "SELECT file_path, folder_path, index_folder, COUNT(*) "
        "FROM chunks GROUP BY file_path").fetchall()
    root = get_settings().root_path
    rebuilt = 0
    for file_path, folder_path, index_folder, count in rows:
        abs_path = root / file_path
        content_hash = ""
        size = 0
        if abs_path.exists():
            content_hash = compute_file_hash(abs_path)
            size = abs_path.stat().st_size
        db.upsert_indexed_file(IndexedFile(
            file_path=file_path, folder_path=folder_path,
            index_folder=index_folder, content_hash=content_hash,
            file_size=size, chunk_count=count))
        rebuilt += 1
    print(f"rebuilt {rebuilt} indexed_files rows from "
          f"{payloads.count()} chunks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
