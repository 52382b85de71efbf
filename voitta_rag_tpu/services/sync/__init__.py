"""Sync connector factory (reference services/sync/__init__.py:14-32)."""

from __future__ import annotations

from voitta_rag_tpu.services.sync.base import BaseSyncConnector, RemoteFile  # noqa: F401


def get_connector(source_type: str) -> BaseSyncConnector:
    if source_type == "filesystem":
        from voitta_rag_tpu.services.sync.filesystem import FilesystemConnector

        return FilesystemConnector()
    if source_type == "github":
        from voitta_rag_tpu.services.sync.github import GithubConnector

        return GithubConnector()
    if source_type == "sharepoint":
        from voitta_rag_tpu.services.sync.sharepoint import SharePointConnector

        return SharePointConnector()
    if source_type == "google_drive":
        from voitta_rag_tpu.services.sync.google_drive import GoogleDriveConnector

        return GoogleDriveConnector()
    if source_type == "azure_devops":
        from voitta_rag_tpu.services.sync.azure_devops import AzureDevOpsConnector

        return AzureDevOpsConnector()
    if source_type == "jira":
        from voitta_rag_tpu.services.sync.jira import JiraConnector

        return JiraConnector()
    if source_type == "confluence":
        from voitta_rag_tpu.services.sync.confluence import ConfluenceConnector

        return ConfluenceConnector()
    if source_type == "box":
        from voitta_rag_tpu.services.sync.box import BoxConnector

        return BoxConnector()
    if source_type == "glue_catalog":
        from voitta_rag_tpu.services.sync.glue_catalog import GlueCatalogConnector

        return GlueCatalogConnector()
    raise ValueError(f"Unknown source type: {source_type}")
