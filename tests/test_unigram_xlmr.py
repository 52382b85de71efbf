"""XLM-R model family (multilingual-e5): from-scratch SentencePiece-Unigram
tokenizer parity vs the HF ``tokenizers`` runtime, Viterbi segmentation
properties, loader dispatch, and encoder forward parity vs torch
XLMRobertaModel (reference loads these via sentence-transformers,
reference config.py:33-36)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.models.encoder import PRESETS, encoder_forward
from voitta_rag_tpu.models.tokenizer import UnigramTokenizer, load_tokenizer

# piece → log-prob table; ▁-prefixed pieces are word-initial (Metaspace)
PIECES = [
    ("<s>", 0.0), ("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0),
    ("▁hello", -6.0), ("▁he", -2.5), ("llo", -2.5), ("▁world", -3.0),
    ("▁", -4.0), ("h", -5.0), ("e", -5.0), ("l", -5.0), ("o", -5.0),
    ("w", -5.0), ("r", -5.0), ("d", -5.0), ("▁42", -3.5), ("4", -5.0),
    ("2", -5.0), ("▁ünïcödé", -4.2),
]


def tokenizer_json(tmp_path, pieces=PIECES):
    data = {
        "version": "1.0",
        "added_tokens": [
            {"id": i, "content": c, "special": True, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False}
            for i, c in enumerate(["<s>", "<pad>", "</s>", "<unk>"])
        ],
        "normalizer": {"type": "NFKC"},
        "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                          "prepend_scheme": "always", "split": True},
        "post_processor": None,
        "decoder": {"type": "Metaspace", "replacement": "▁",
                    "prepend_scheme": "always", "split": True},
        "model": {"type": "Unigram", "unk_id": 3,
                  "vocab": [[p, lp] for p, lp in pieces],
                  "byte_fallback": False},
    }
    p = tmp_path / "tokenizer.json"
    p.write_text(json.dumps(data), encoding="utf-8")
    return p


def test_viterbi_prefers_max_logprob_path(tmp_path):
    tok = UnigramTokenizer.from_tokenizer_json(tokenizer_json(tmp_path))
    # "▁hello" scores -6.0; "▁he"+"llo" scores -5.0 → split wins.
    ids = tok.tokenize_ids("hello")
    pieces = [PIECES[i][0] for i in ids]
    assert pieces == ["▁he", "llo"]
    assert [PIECES[i][0] for i in tok.tokenize_ids("world")] == ["▁world"]


def test_unknown_char_runs_fuse_to_one_unk(tmp_path):
    tok = UnigramTokenizer.from_tokenizer_json(tokenizer_json(tmp_path))
    ids = tok.tokenize_ids("hexxxxlo")
    # ▁+h+e, one fused unk for the xxxx run, l+o singles
    assert ids.count(3) == 1


def test_framing_and_padding(tmp_path):
    tok = UnigramTokenizer.from_tokenizer_json(tokenizer_json(tmp_path))
    ids, mask = tok.encode_batch(["hello world"], 10)
    assert ids[0][0] == 0 and ids[0][mask[0].sum() - 1] == 2  # <s> … </s>
    assert ids[0][mask[0].sum():].tolist() == [1] * (10 - mask[0].sum())


def test_load_tokenizer_dispatches_unigram(tmp_path):
    tokenizer_json(tmp_path)
    assert isinstance(load_tokenizer(tmp_path), UnigramTokenizer)


def test_load_tokenizer_ignores_wordpiece_tokenizer_json(tmp_path):
    (tmp_path / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "WordPiece", "vocab": {}}}), encoding="utf-8")
    (tmp_path / "vocab.txt").write_text(
        "[PAD]\n[UNK]\n[CLS]\n[SEP]\nhello\n")
    from voitta_rag_tpu.models.tokenizer import WordPieceTokenizer

    assert isinstance(load_tokenizer(tmp_path), WordPieceTokenizer)


def test_unigram_parity_with_hf_tokenizers(tmp_path):
    """Differential test vs the real HF Unigram implementation on every
    segmentation case: merge preference, unk runs, multi-word, unicode."""
    hf_tok = pytest.importorskip("tokenizers")
    hf = hf_tok.Tokenizer.from_file(str(tokenizer_json(tmp_path)))
    ours = UnigramTokenizer.from_tokenizer_json(tmp_path / "tokenizer.json")
    for text in ["hello", "hello world", "world hello  world", "42",
                 "hexlo world", "ünïcödé", "hello ünïcödé 42", "dolor",
                 "wrld", "o", "hello    world"]:
        assert ours.tokenize_ids(text) == hf.encode(text).ids, text


def test_multilingual_e5_presets():
    cfg = PRESETS["intfloat/multilingual-e5-base"]
    assert (cfg.arch, cfg.pos_offset, cfg.pad_token_id) == ("roberta", 2, 1)
    assert cfg.vocab_size == 250002 and cfg.max_position == 514
    large = PRESETS["intfloat/multilingual-e5-large"]
    assert large.hidden_size == 1024 and large.num_layers == 24


@pytest.mark.slow
def test_parity_with_torch_xlmroberta():
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=34, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0, layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = XLMRobertaModel(hf_cfg).eval()
    state = {f"roberta.{k}": v.detach().numpy()
             for k, v in model.state_dict().items()}

    from voitta_rag_tpu.models.weights import (
        config_from_state_dict, params_from_state_dict,
    )
    cfg = config_from_state_dict(state, hints={
        "num_attention_heads": 4, "layer_norm_eps": 1e-5,
        "model_type": "xlm-roberta"})
    assert cfg.arch == "roberta" and cfg.pos_offset == 2
    params = params_from_state_dict(state, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 64, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 1

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    ours = np.asarray(encoder_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        use_pallas_attn=False,
    ))
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4)


@pytest.mark.slow
def test_embedding_service_loads_xlmr_checkpoint_dir(tmp_path, monkeypatch):
    """Full load path: HF-style dir (config.json model_type=xlm-roberta +
    pytorch_model.bin + Unigram tokenizer.json) → EmbeddingService encode,
    matching sentence-transformers output end-to-end."""
    torch = pytest.importorskip("torch")
    from transformers import XLMRobertaConfig, XLMRobertaModel

    hf_cfg = XLMRobertaConfig(
        vocab_size=len(PIECES), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=34, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0, layer_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    model = XLMRobertaModel(hf_cfg).eval()
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "xlm-roberta", "num_attention_heads": 4,
        "layer_norm_eps": 1e-5, "pad_token_id": 1}))
    tokenizer_json(tmp_path)

    monkeypatch.setenv("VOITTA_ENCODER_DTYPE", "float32")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    from voitta_rag_tpu.services.embedding import EmbeddingService

    svc = EmbeddingService(model_name="xlmr-test",
                           model_path=str(tmp_path), max_seq_len=16)
    vecs = svc.embed_texts_array(["hello world", "world"])
    assert vecs.shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(vecs, axis=1), 1.0, atol=1e-3)

    # Oracle: HF tokenization + torch forward + mean-pool + L2 norm.
    import tokenizers as hf_tok
    hf = hf_tok.Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    ids = [0] + hf.encode("hello world").ids + [2]
    with torch.no_grad():
        hid = model(input_ids=torch.tensor([ids]),
                    attention_mask=torch.ones(1, len(ids), dtype=torch.long)
                    ).last_hidden_state.numpy()[0]
    ref = hid.mean(axis=0)
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(vecs[0], ref, atol=2e-4)
    get_settings.cache_clear()
