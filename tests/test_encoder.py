"""Encoder correctness: shapes, pooling, tokenizer, and parity vs HF BERT.

The parity test instantiates a tiny torch BertModel with random weights,
exports its state dict through models.weights, and checks our JAX forward
matches transformers' reference implementation numerically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.models.encoder import (
    EncoderConfig, PRESETS, encode_tokens, encoder_forward, init_params,
    mean_pool_normalize,
)
from voitta_rag_tpu.models.tokenizer import (
    HashTokenizer, WordPieceTokenizer, basic_tokenize,
)

TINY = PRESETS["test-tiny"]


def toks(B=2, L=16, seed=0, cfg=TINY):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.vocab_size, (B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[0, L // 2:] = 0
    ids[mask == 0] = 0
    return jnp.asarray(ids), jnp.asarray(mask)


def test_forward_shapes_and_norm():
    params = init_params(jax.random.PRNGKey(0), TINY)
    ids, mask = toks()
    emb = encode_tokens(params, TINY, ids, mask)
    assert emb.shape == (2, TINY.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               atol=1e-5)


def test_padding_does_not_change_embedding():
    """Mean pooling + key-padding bias: extending padding must be a no-op."""
    params = init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(1)
    real = rng.integers(4, TINY.vocab_size, (1, 10)).astype(np.int32)
    ids_a = jnp.asarray(np.pad(real, ((0, 0), (0, 6))))
    mask_a = jnp.asarray(np.pad(np.ones((1, 10), np.int32), ((0, 0), (0, 6))))
    ids_b = jnp.asarray(np.pad(real, ((0, 0), (0, 22))))
    mask_b = jnp.asarray(np.pad(np.ones((1, 10), np.int32), ((0, 0), (0, 22))))
    ea = np.asarray(encode_tokens(params, TINY, ids_a, mask_a))
    eb = np.asarray(encode_tokens(params, TINY, ids_b, mask_b))
    np.testing.assert_allclose(ea, eb, atol=1e-5)


def test_pallas_attention_matches_xla():
    params = init_params(jax.random.PRNGKey(0), TINY)
    ids, mask = toks(B=3, L=32)
    h_pallas = encoder_forward(params, TINY, ids, mask, use_pallas_attn=True)
    h_xla = encoder_forward(params, TINY, ids, mask, use_pallas_attn=False)
    np.testing.assert_allclose(np.asarray(h_pallas), np.asarray(h_xla),
                               atol=2e-4)


def test_mean_pool_ignores_padding():
    h = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 8)),
                    jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
    pooled = mean_pool_normalize(h, mask)
    manual = np.asarray(h)[0, :2].mean(axis=0)
    manual /= np.linalg.norm(manual)
    np.testing.assert_allclose(np.asarray(pooled)[0], manual, atol=1e-6)


# ---- tokenizer ----

def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("Café") == ["cafe"]
    assert basic_tokenize("foo\tbar\nbaz") == ["foo", "bar", "baz"]


def test_wordpiece_greedy_longest_match():
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##aff", "##able",
         "##ffa", "hello", "world"])}
    tok = WordPieceTokenizer(vocab)
    assert tok.wordpiece("unaffable") == [vocab["un"], vocab["##aff"], vocab["##able"]]
    assert tok.wordpiece("zzz") == [tok.unk_id]
    ids = tok.tokenize_ids("hello world")
    assert ids == [vocab["hello"], vocab["world"]]


def test_bert_vocab_with_stray_angle_tokens_keeps_bracket_specials():
    # A custom BERT vocab that happens to contain '<s>'/'<pad>' as ordinary
    # tokens must NOT have its framing ids hijacked by the MPNet angle
    # preference — only a true MPNet layout (<s>=0, <pad>=1) switches.
    vocab = {t: i for i, t in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "<s>", "<pad>",
         "</s>"])}
    tok = WordPieceTokenizer(vocab)
    assert (tok.pad_id, tok.cls_id, tok.sep_id) == (0, 2, 3)
    mpnet_vocab = {t: i for i, t in enumerate(
        ["<s>", "<pad>", "</s>", "<unk>", "[UNK]", "[PAD]", "[CLS]",
         "[SEP]", "hello"])}
    mtok = WordPieceTokenizer(mpnet_vocab)
    assert (mtok.pad_id, mtok.cls_id, mtok.sep_id) == (1, 0, 2)
    assert mtok.unk_id == mpnet_vocab["[UNK]"]


def test_encode_batch_framing():
    tok = HashTokenizer(vocab_size=1000)
    ids, mask = tok.encode_batch(["short text", "a much longer text " * 20], 16)
    assert ids.shape == (2, 16)
    assert ids[0, 0] == tok.cls_id
    n0 = mask[0].sum()
    assert ids[0, n0 - 1] == tok.sep_id
    assert mask[1].sum() == 16  # truncated to max_len


def test_hash_tokenizer_deterministic():
    a = HashTokenizer(vocab_size=5000).tokenize_ids("deterministic tokens here")
    b = HashTokenizer(vocab_size=5000).tokenize_ids("deterministic tokens here")
    assert a == b
    assert all(4 <= i < 5000 for i in a)


# ---- parity vs HF transformers BertModel ----

@pytest.mark.slow
def test_parity_with_torch_bert():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, hidden_act="gelu",
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from voitta_rag_tpu.models.weights import (
        config_from_state_dict, params_from_state_dict,
    )
    cfg = config_from_state_dict(state)
    cfg = EncoderConfig(**{**cfg.__dict__, "num_heads": 4})
    params = params_from_state_dict(state, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    ours = np.asarray(encoder_forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        use_pallas_attn=False,
    ))
    # Compare only non-padding positions.
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4)


def test_embedding_service_dp_sharded_encode(temp_root, monkeypatch):
    """VOITTA_ENCODE_DP shards the batch over the dp mesh; embeddings match
    the single-device encode bit-for-bit (pure data parallelism)."""
    from voitta_rag_tpu.config import get_settings
    from voitta_rag_tpu.services.embedding import EmbeddingService

    texts = [f"document {i} about parallel encoding" for i in range(11)]

    monkeypatch.setenv("VOITTA_ENCODE_DP", "1")
    get_settings.cache_clear()
    svc1 = EmbeddingService(model_name="test-tiny", model_path="",
                            max_seq_len=32)
    ref = svc1.embed_texts_array(texts)

    monkeypatch.setenv("VOITTA_ENCODE_DP", "8")
    get_settings.cache_clear()
    svc8 = EmbeddingService(model_name="test-tiny", model_path="",
                            max_seq_len=32)
    assert svc8._resolve_dp() == 8
    out = svc8.embed_texts_array(texts)
    svc8._ensure_model()
    assert svc8._batch_sharding is not None
    assert out.shape == ref.shape
    import numpy as np

    np.testing.assert_allclose(out, ref, atol=1e-5)
    get_settings.cache_clear()
