from voitta_rag_tpu.mcp.server import create_mcp_app  # noqa: F401
