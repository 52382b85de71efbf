"""File/folder metadata notes (reference services/metadata.py:44-66)."""

from __future__ import annotations

from voitta_rag_tpu.db.database import get_db


class MetadataService:
    def get(self, path: str) -> dict | None:
        db = get_db()
        rec = db.get_file_metadata(path)
        if rec is None:
            return None
        updated_by_name = None
        if rec.updated_by:
            row = db.query_one("SELECT name FROM users WHERE id=?",
                               (rec.updated_by,))
            updated_by_name = row["name"] if row else None
        return {
            "path": rec.path,
            "metadata": rec.metadata_text,
            "updated_at": rec.updated_at,
            "updated_by": updated_by_name,
        }

    def set(self, path: str, text: str | None, user_name: str | None) -> dict:
        db = get_db()
        user_id = None
        if user_name:
            user_id = db.get_or_create_user(user_name).id
        db.set_file_metadata(path, text, user_id)
        return self.get(path)

    def delete(self, path: str) -> bool:
        db = get_db()
        if db.get_file_metadata(path) is None:
            return False
        db.delete_file_metadata(path)
        return True


def get_metadata_service() -> MetadataService:
    return MetadataService()
