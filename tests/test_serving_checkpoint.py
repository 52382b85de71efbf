"""Serving the owned offline-trained retrieval checkpoint.

The reference serves frozen pretrained e5 weights
(/root/reference/src/voitta/services/embedding.py:24-42, config.py:33-36); no
pretrained weights exist in this offline image, so the product serves the
repo's own offline-trained checkpoint (scripts/train_retrieval_ckpt.py) by
default instead of random init. These tests cover the resolution contract:

- EMBEDDING_MODEL_PATH unset  -> auto-serve the committed checkpoint, with
  model name / vector dimension / sparse fusion weight following it;
- EMBEDDING_MODEL_PATH="none" -> explicit random-init opt-out (the
  historical default the rest of the suite pins in conftest.py);
- the .npz serving path itself: CRC tokenizer, trained-length clamp,
  checkpoint-dimension embeddings that differ from random init.
"""

import numpy as np
import pytest

from voitta_rag_tpu.config import get_settings

CKPT = None


def setup_module(module):
    global CKPT
    from voitta_rag_tpu.config import _default_ckpt_path

    CKPT = _default_ckpt_path()


def _needs_ckpt():
    if not CKPT:
        pytest.skip("no committed retrieval checkpoint in this worktree")


def test_auto_resolution(monkeypatch):
    _needs_ckpt()
    monkeypatch.delenv("EMBEDDING_MODEL_PATH", raising=False)
    monkeypatch.delenv("EMBEDDING_MODEL", raising=False)
    monkeypatch.delenv("EMBEDDING_DIMENSION", raising=False)
    monkeypatch.delenv("SPARSE_WEIGHT", raising=False)
    get_settings.cache_clear()
    s = get_settings()
    assert s.embedding_model_path == CKPT
    assert s.embedding_model == "sentence-transformers/all-MiniLM-L6-v2"
    assert s.embedding_dimension == 384
    # owned from-scratch encoder -> bench-tuned sparse weight, not the
    # reference's frozen-e5 default of 0.1
    assert s.sparse_weight > 0.1


def test_explicit_optout(monkeypatch):
    monkeypatch.setenv("EMBEDDING_MODEL_PATH", "none")
    monkeypatch.delenv("EMBEDDING_MODEL", raising=False)
    monkeypatch.delenv("EMBEDDING_DIMENSION", raising=False)
    monkeypatch.delenv("SPARSE_WEIGHT", raising=False)
    get_settings.cache_clear()
    s = get_settings()
    assert s.embedding_model_path == ""
    assert s.embedding_model == "intfloat/e5-base-v2"
    assert s.embedding_dimension == 768
    assert s.sparse_weight == pytest.approx(0.1)


def test_env_overrides_still_win(monkeypatch):
    _needs_ckpt()
    monkeypatch.delenv("EMBEDDING_MODEL_PATH", raising=False)
    monkeypatch.setenv("EMBEDDING_DIMENSION", "512")
    monkeypatch.setenv("SPARSE_WEIGHT", "0.3")
    get_settings.cache_clear()
    s = get_settings()
    assert s.embedding_dimension == 512
    assert s.sparse_weight == pytest.approx(0.3)


def test_npz_serving_path(monkeypatch):
    _needs_ckpt()
    from voitta_rag_tpu.services.embedding import (
        EmbeddingService, _CrcTokenizer,
    )

    svc = EmbeddingService(
        model_name="sentence-transformers/all-MiniLM-L6-v2",
        model_path=CKPT)
    assert svc.dimension == 384
    # CRC tokenizer installed, not WordPiece; trained-length clamp applied
    assert isinstance(svc._tokenizer, _CrcTokenizer)
    assert svc.max_seq_len <= 96
    assert not svc.uses_e5_prefixes  # no e5 "query:"/"passage:" prefixes

    v = np.asarray(svc.embed_query_array("sourdough starter fermentation"))
    assert v.shape == (384,)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=2e-2)

    # trained weights, not the deterministic random init
    rand = EmbeddingService(
        model_name="sentence-transformers/all-MiniLM-L6-v2", model_path="")
    r = np.asarray(rand.embed_query_array("sourdough starter fermentation"))
    assert r.shape[0] == 384
    assert not np.allclose(v, r, atol=1e-3)

    batch = svc.embed_texts_array(["bread baking with a mature starter",
                                   "orbital mechanics of transfer windows"])
    assert batch.shape == (2, 384)
    # the trained space separates on-topic from off-topic better than noise:
    # query should sit closer to the bread passage than the orbit passage
    sims = batch @ v
    assert sims[0] > sims[1]
