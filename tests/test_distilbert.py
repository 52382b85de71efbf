"""DistilBERT model family: weight import, config inference, and forward
parity vs transformers DistilBertModel (the msmarco-/multi-qa-distilbert
sentence-transformers retrievers).

DistilBERT is a post-LN BERT block with no token-type table and its own
checkpoint key names (transformer.layer.N.attention.q_lin, sa_layer_norm,
ffn.lin1/lin2); the forward maps onto the shared encoder unchanged
(reference: services/embedding.py loads any sentence-transformers model).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.models.encoder import PRESETS, encoder_forward, init_params


def make_distilbert(seed=0):
    import torch
    from transformers import DistilBertConfig, DistilBertModel

    hf_cfg = DistilBertConfig(
        vocab_size=128, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=48, dropout=0.0, attention_dropout=0.0,
        activation="gelu",
    )
    torch.manual_seed(seed)
    return DistilBertModel(hf_cfg).eval()


def test_config_inference_from_state_dict():
    pytest.importorskip("torch")
    model = make_distilbert()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from voitta_rag_tpu.models.weights import config_from_state_dict

    # arch detected from the transformer.layer.* key shape, no hints needed
    cfg = config_from_state_dict(state, hints={"n_heads": 4})
    assert cfg.arch == "distilbert"
    assert cfg.num_layers == 2 and cfg.num_heads == 4
    assert cfg.hidden_size == 32 and cfg.intermediate_size == 64
    assert cfg.type_vocab_size == 0 and cfg.pos_offset == 0
    assert cfg.pad_token_id == 0 and cfg.layer_norm_eps == 1e-12


@pytest.mark.slow
def test_parity_with_torch_distilbert():
    torch = pytest.importorskip("torch")

    model = make_distilbert()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from voitta_rag_tpu.models.weights import (
        config_from_state_dict, params_from_state_dict,
    )
    cfg = config_from_state_dict(state, hints={"model_type": "distilbert",
                                               "n_heads": 4})
    params = params_from_state_dict(state, cfg)
    assert "token_type" not in params["embeddings"]
    assert "rel_bias" not in params

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 128, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    ids[1, 8:] = 0  # right-pad with [PAD]

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    ours = np.asarray(encoder_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        use_pallas_attn=False,
    ))
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4)


def test_distilbert_preset_and_random_init_forward():
    cfg = PRESETS["sentence-transformers/multi-qa-distilbert-cos-v1"]
    assert cfg.arch == "distilbert" and cfg.num_layers == 6
    assert cfg.type_vocab_size == 0 and cfg.vocab_size == 30522

    tiny = type(cfg)(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=34, type_vocab_size=0,
        arch="distilbert")
    import jax
    params = init_params(jax.random.PRNGKey(0), tiny)
    assert "token_type" not in params["embeddings"]
    ids = jnp.asarray(np.ones((1, 8)), jnp.int32)
    out = encoder_forward(params, tiny, ids, jnp.ones((1, 8), jnp.int32),
                          use_pallas_attn=False)
    assert out.shape == (1, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_training_specs_cover_distilbert_tree():
    """dp x tp partition specs adapt to the DistilBERT param tree (no
    token_type leaf)."""
    import jax

    from voitta_rag_tpu.models.encoder import EncoderConfig
    from voitta_rag_tpu.models.training import param_specs

    cfg = EncoderConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, intermediate_size=64, max_position=34,
                        type_vocab_size=0, arch="distilbert")
    params = init_params(jax.random.PRNGKey(0), cfg)
    specs = param_specs(params)
    # identical tree structure: tree.map would raise on mismatch
    jax.tree.map(lambda p, s: None, params, specs,
                 is_leaf=lambda x: isinstance(x, jax.Array))


def test_embedding_service_end_to_end_with_distilbert_checkpoint(
        tmp_path, temp_root, monkeypatch):
    pytest.importorskip("torch")
    model = make_distilbert(seed=1)
    ckpt = tmp_path / "distilbert-tiny"
    model.save_pretrained(str(ckpt))
    (ckpt / "vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world"] +
        [f"tok{i}" for i in range(122)]) + "\n")

    monkeypatch.setenv("EMBEDDING_MODEL_PATH", str(ckpt))
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()

    from voitta_rag_tpu.services.embedding import EmbeddingService

    svc = EmbeddingService(model_name="distilbert-tiny")
    # no VOITTA_MAX_SEQ_LEN override: the service must clamp its seq len
    # to the checkpoint's 48-row position table instead of crashing
    embs = np.asarray(svc.embed_texts_array(["hello world",
                                             "world hello hello"]))
    assert embs.shape == (2, 32)
    assert svc._cfg.arch == "distilbert"
    assert svc.max_seq_len == 48
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-3)
