"""MCP tool result models (pydantic) — schemas mirror the reference's
(mcp_server.py:293-355, 891-900, 976-990, 1163-1184) field for field."""

from __future__ import annotations

from pydantic import BaseModel, Field


class SearchResult(BaseModel):
    text: str = Field(description="The text content of the chunk")
    score: float = Field(description="Similarity score (0-1, higher is better)")
    file_path: str = Field(description="Path to the source file")
    file_name: str = Field(description="Name of the source file")
    folder_path: str = Field(description="Folder containing the file")
    index_folder: str = Field(description="Folder at which indexing was triggered")
    chunk_index: int = Field(description="Index of this chunk within the file")
    total_chunks: int = Field(description="Total number of chunks in the file")
    file_metadata: str | None = Field(default=None, description="User-added metadata/notes for the file")
    source_created_at: str | None = Field(default=None, description="When the source file was originally created")
    source_modified_at: str | None = Field(default=None, description="When the source file was last modified")
    memory_id: str | None = Field(default=None, description="Memory UUID if this result is from Anamnesis")
    source_url: str | None = Field(default=None, description="Original external URL if available")


class IndexedFolderInfo(BaseModel):
    folder_path: str
    status: str
    file_count: int
    total_chunks: int
    metadata: str | None = None


class FileContent(BaseModel):
    file_path: str
    file_name: str
    content: str
    chunk_count: int
    metadata: str | None = None


class ChunkRangeResult(BaseModel):
    success: bool
    file_path: str
    merged_text: str
    first_chunk: int
    last_chunk: int
    actual_first_chunk: int
    actual_last_chunk: int
    total_chunks_in_file: int
    chunks_returned: int
    truncated_to_limit: bool
    truncated_beyond_file: bool
    error: str | None = None


class FileUriResult(BaseModel):
    uri: str
    file_path: str
    file_name: str
    size: int
    mime_type: str


class ResolveUrlResult(BaseModel):
    success: bool
    url: str
    normalized_url: str | None = None
    file_path: str | None = None
    file_name: str | None = None
    content: str | None = None
    chunk_count: int | None = None
    error: str | None = None


class FolderActiveState(BaseModel):
    folder_path: str
    is_active: bool


class SetFolderActiveResult(BaseModel):
    success: bool
    folder_path: str
    is_active: bool
    subfolders_updated: int
    error: str | None = None


class MemoryResult(BaseModel):
    success: bool
    memory_id: str | None = None
    content: str | None = None
    created_at: str | None = None
    modified_at: str | None = None
    likes: int | None = None
    dislikes: int | None = None
    error: str | None = None


class MemoryListResult(BaseModel):
    success: bool
    memories: list[MemoryResult] = Field(default_factory=list)
    error: str | None = None
