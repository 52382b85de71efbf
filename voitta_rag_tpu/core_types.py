"""Core datatypes: the chunk/metadata behavior contract.

Mirrors the reference's ``ChunkMetadata`` / ``StoredChunk`` payload schema
(/root/reference/src/voitta/services/vector_store.py:18-51) and the chunker's
``Chunk`` (/root/reference/src/voitta/services/chunking.py:10-16).

On device these become struct-of-arrays columns (see
:mod:`voitta_rag_tpu.index.segment`): a dense ``[N, D]`` matrix, fixed-slot
sparse term arrays, and int32 filter columns (interned folder ids, epoch
timestamps, ACL group ids). The dataclasses here are the host-side view.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass
class Chunk:
    """A chunk of text emitted by the chunker (reference chunking.py:10-16)."""

    text: str
    index: int
    start_char: int
    end_char: int


@dataclass
class ChunkMetadata:
    """Payload stored alongside each chunk (reference vector_store.py:18-41)."""

    file_path: str
    folder_path: str  # folder containing the file
    index_folder: str  # folder at which indexing was triggered
    file_name: str
    chunk_index: int
    total_chunks: int
    start_char: int
    end_char: int
    indexed_at: str  # ISO format
    # PDF-specific fields (None for non-PDF files)
    start_page: int | None = None
    end_page: int | None = None
    source_page_count: int | None = None
    # Source timestamps (Unix epoch integers)
    source_created_at: int | None = None
    source_modified_at: int | None = None
    # ACL: lowercase emails allowed to access this document (None = public)
    allowed_users: list[str] | None = None
    # Original external URL (e.g. Google Docs link)
    source_url: str | None = None

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ChunkMetadata":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class StoredChunk:
    """A chunk retrieved from the index (reference vector_store.py:44-51)."""

    id: str
    text: str
    metadata: ChunkMetadata
    score: float | None = None


@dataclass
class SparseVector:
    """A sparse BM25 vector as (term-hash indices, weights) pairs.

    Matches the reference's fastembed contract (services/sparse_embedding.py:29-50)
    where embeddings are ``(indices, values)`` lists.
    """

    indices: list[int] = field(default_factory=list)
    values: list[float] = field(default_factory=list)

    def __post_init__(self) -> None:
        assert len(self.indices) == len(self.values)

    def __len__(self) -> int:
        return len(self.indices)
