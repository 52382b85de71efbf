"""RoBERTa model family: byte-level BPE tokenizer parity vs HF, encoder
forward parity vs transformers RobertaModel, arch detection, and the
position-id offset convention."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.models.encoder import (
    EncoderConfig, PRESETS, encoder_forward,
)
from voitta_rag_tpu.models.tokenizer import (
    ByteLevelBpeTokenizer, load_tokenizer,
)


def tiny_bpe_files(tmp_path):
    """Craft a small but real vocab.json/merges.txt pair (specials + byte
    alphabet + a few merges), loadable by both our tokenizer and HF's."""
    from voitta_rag_tpu.models.tokenizer import _bytes_to_unicode

    alphabet = sorted(set(_bytes_to_unicode().values()))
    tokens = ["<s>", "<pad>", "</s>", "<unk>"] + alphabet
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
              ("Ġ", "w"), ("Ġw", "o"), ("Ġwo", "r"), ("Ġwor", "l"),
              ("Ġworl", "d"), ("1", "2"), ("12", "3")]
    for a, b in merges:
        if a + b not in tokens:
            tokens.append(a + b)
    vocab = {t: i for i, t in enumerate(tokens)}
    vj = tmp_path / "vocab.json"
    mt = tmp_path / "merges.txt"
    vj.write_text(json.dumps(vocab), encoding="utf-8")
    mt.write_text("#version: 0.2\n" + "\n".join(
        f"{a} {b}" for a, b in merges) + "\n", encoding="utf-8")
    return vj, mt, vocab


def test_bpe_merges_and_byte_fallback(tmp_path):
    vj, mt, vocab = tiny_bpe_files(tmp_path)
    tok = ByteLevelBpeTokenizer.from_files(vj, mt)
    ids = tok.tokenize_ids("hello world")
    id_to_tok = {v: k for k, v in vocab.items()}
    pieces = [id_to_tok[i] for i in ids]
    assert pieces == ["hello", "Ġworld"]
    # Numbers merge per ranks; unknown bytes fall back to single-byte tokens.
    pieces = [id_to_tok[i] for i in tok.tokenize_ids("123")]
    assert pieces == ["123"]
    pieces = [id_to_tok[i] for i in tok.tokenize_ids("xy")]
    assert pieces == ["x", "y"]


def test_bpe_parity_with_hf_roberta_tokenizer(tmp_path):
    pytest.importorskip("transformers")
    from transformers import RobertaTokenizer

    vj, mt, _ = tiny_bpe_files(tmp_path)
    hf = RobertaTokenizer(str(vj), str(mt))
    ours = ByteLevelBpeTokenizer.from_files(vj, mt)
    for text in ["hello world", "hello  hello", "123 456", "don't stop",
                 "...!!", "tabs\tand\nnewlines", "ünïcödé bytes"]:
        assert ours.tokenize_ids(text) == hf.encode(
            text, add_special_tokens=False), text
    # Framing parity: <s> ... </s>.
    ids, mask = ours.encode_batch(["hello world"], 16)
    hf_ids = hf.encode("hello world", add_special_tokens=True)
    assert ids[0][: len(hf_ids)].tolist() == hf_ids
    assert mask[0].sum() == len(hf_ids)
    assert ids[0][len(hf_ids):].tolist() == [ours.pad_id] * (16 - len(hf_ids))


def test_load_tokenizer_picks_bpe(tmp_path):
    tiny_bpe_files(tmp_path)
    tok = load_tokenizer(tmp_path)
    assert isinstance(tok, ByteLevelBpeTokenizer)


@pytest.mark.slow
def test_parity_with_torch_roberta():
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=34, type_vocab_size=1, pad_token_id=1,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0, layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    model = RobertaModel(hf_cfg).eval()
    state = {f"roberta.{k}": v.detach().numpy()
             for k, v in model.state_dict().items()}

    from voitta_rag_tpu.models.weights import (
        config_from_state_dict, params_from_state_dict,
    )
    cfg = config_from_state_dict(state, hints={
        "num_attention_heads": 4, "layer_norm_eps": 1e-5,
        "model_type": "roberta"})
    assert cfg.arch == "roberta" and cfg.pos_offset == 2
    params = params_from_state_dict(state, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 128, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 1  # right-pad with <pad>

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    ours = np.asarray(encoder_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        use_pallas_attn=False,
    ))
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4)


def test_distilroberta_preset_geometry():
    cfg = PRESETS["sentence-transformers/all-distilroberta-v1"]
    assert (cfg.arch, cfg.pos_offset, cfg.pad_token_id) == ("roberta", 2, 1)
    assert cfg.vocab_size == 50265 and cfg.max_position == 514
    # Usable sequence length excludes the two reserved position rows.
    assert cfg.max_position - cfg.pos_offset == 512


def test_arch_detection_without_prefix():
    """sentence-transformers checkpoints strip the 'roberta.' prefix; the
    514-row position table + single token type still identify the family."""
    from voitta_rag_tpu.models.weights import _detect_arch

    state = {
        "embeddings.position_embeddings.weight": np.zeros((514, 8)),
        "embeddings.token_type_embeddings.weight": np.zeros((1, 8)),
    }
    assert _detect_arch(state) == "roberta"
    state["embeddings.position_embeddings.weight"] = np.zeros((512, 8))
    state["embeddings.token_type_embeddings.weight"] = np.zeros((2, 8))
    assert _detect_arch(state) == "bert"


def test_embedding_service_end_to_end_with_roberta_checkpoint(
        tmp_path, temp_root, monkeypatch):
    """EMBEDDING_MODEL_PATH pointing at a RoBERTa checkpoint dir (weights +
    vocab.json/merges.txt) drives the whole service: BPE tokenizer picked,
    arch detected, embeddings unit-norm and deterministic."""
    torch = pytest.importorskip("torch")
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(
        vocab_size=300, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(1)
    model = RobertaModel(hf_cfg).eval()
    ckpt = tmp_path / "roberta-tiny"
    model.save_pretrained(str(ckpt))
    vj, mt, _ = tiny_bpe_files(ckpt)

    monkeypatch.setenv("EMBEDDING_MODEL_PATH", str(ckpt))
    monkeypatch.setenv("EMBEDDING_MODEL", "roberta-tiny")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "32")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    import voitta_rag_tpu.services.embedding as embmod
    embmod.reset_embedding_service()
    try:
        svc = embmod.get_embedding_service()
        vecs = svc.embed_texts_array(["hello world", "123 456"])
        assert vecs.shape == (2, 32)
        np.testing.assert_allclose(
            np.linalg.norm(vecs, axis=1), 1.0, atol=1e-3)
        assert isinstance(svc._tokenizer, ByteLevelBpeTokenizer)
        assert svc._cfg.arch == "roberta" and svc._cfg.pos_offset == 2
        # Deterministic: same text → same embedding.
        again = svc.embed_texts_array(["hello world"])
        np.testing.assert_allclose(again[0], vecs[0], atol=1e-5)
    finally:
        embmod.reset_embedding_service()
        get_settings.cache_clear()
