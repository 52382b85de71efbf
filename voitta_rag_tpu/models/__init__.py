"""Embedding model family: BERT-style encoders run TPU-native.

Replaces the reference's sentence-transformers stack (services/embedding.py,
config.py:33-36). Supported model configs cover the reference's embedding
model families: intfloat/e5-base-v2 (default), BAAI/bge-base-en-v1.5, and
sentence-transformers/all-MiniLM-L6-v2 (BASELINE configs 1 & 4).
"""

from voitta_rag_tpu.models.encoder import (  # noqa: F401
    EncoderConfig, PRESETS, init_params, encode_tokens, encoder_forward,
)
from voitta_rag_tpu.models.tokenizer import WordPieceTokenizer, HashTokenizer  # noqa: F401
