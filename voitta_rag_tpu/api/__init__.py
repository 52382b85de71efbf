from voitta_rag_tpu.api.app import create_app  # noqa: F401
