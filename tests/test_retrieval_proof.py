"""Learned-retrieval proof pipeline (models/retrieval_proof.py).

Mechanics tested at CPU scale: harvesting + production chunking, the
document-level train/eval split (no leakage), pair synthesis, the dp x tp
contrastive training loop reducing InfoNCE loss, blocked encoding, and the
duplicate-aware recall metric. The recall *numbers* that prove learned >
{BM25-only, random-init} are measured at TPU scale by bench.py's trained_*
section — a 2-layer model trained 40 steps here is not expected to win.
"""

import numpy as np
import pytest

from voitta_rag_tpu.models.encoder import PRESETS, init_params
from voitta_rag_tpu.models.retrieval_proof import (
    build_task, crc_tokenize, encode_corpus, harvest_docs, recall_at10,
    synth_query, train_encoder,
)


@pytest.fixture(scope="module")
def task():
    docs = harvest_docs(1500)
    assert len(docs) >= 10, "host must have harvestable package sources"
    return build_task(docs, max_eval=32, max_train_pairs=2000), docs


def test_doc_level_split_no_leakage(task):
    t, docs = task
    # Every eval target's document is in the held-out set...
    for row in t.eval_targets:
        assert int(t.chunk_doc[row]) in t.eval_doc_ids
    # ...and no training passage comes from a held-out document.
    eval_texts = {c for d in t.eval_doc_ids for c in docs[d]}
    assert not any(p in eval_texts for _, p in t.train_pairs)


def test_query_synthesis_topical_not_copy(task):
    t, docs = task
    rng = np.random.default_rng(0)
    doc = next(d for d in docs if len(d) >= 3)
    q = synth_query(doc, 1, rng)
    assert len(q.split()) >= 3
    # Neighbor-sourced words: the query is not a substring of its target.
    assert q not in doc[1]


def test_crc_tokenize_deterministic():
    ids1 = crc_tokenize(["hello world", ""], 512, 8)
    ids2 = crc_tokenize(["hello world", ""], 512, 8)
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1[0, 0] == 1 and (ids1[0, 1:3] >= 2).all()
    assert (ids1[1, 1:] == 0).all()


def test_training_reduces_loss_and_encoder_serves(task):
    t, _ = task
    cfg = PRESETS["test-tiny"]
    params, losses = train_encoder(t.train_pairs[:512], cfg, steps=40,
                                   batch=32, max_len=32)
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
    ids = crc_tokenize(t.corpus[:256], cfg.vocab_size, 32)
    emb = np.asarray(encode_corpus(params, cfg, ids, block=64))
    assert emb.shape == (256, cfg.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-3)


def test_recall_metric_credits_exact_duplicates():
    corpus = ["alpha beta", "gamma delta", "alpha beta", "epsilon"]
    targets = np.asarray([0, 3])
    retrieved = np.asarray([[2, 1], [1, 0]])  # duplicate of 0; then a miss
    assert recall_at10(retrieved, targets, corpus) == 0.5


def test_randinit_baseline_runs(task):
    t, _ = task
    cfg = PRESETS["test-tiny"]
    p0 = init_params(__import__("jax").random.PRNGKey(0), cfg)
    ids = crc_tokenize(t.corpus[:128], cfg.vocab_size, 32)
    q_ids = crc_tokenize(t.eval_queries[:8], cfg.vocab_size, 32)
    emb = np.asarray(encode_corpus(p0, cfg, ids, block=64))
    q = np.asarray(encode_corpus(p0, cfg, q_ids, block=64))
    top = np.argsort(-(q @ emb.T), axis=1)[:, :10]
    r = recall_at10(top, t.eval_targets[:8], t.corpus)
    assert 0.0 <= r <= 1.0
