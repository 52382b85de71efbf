"""MPNet model family: shared relative-position attention bias, weight
import, bucket formula, and forward parity vs transformers MPNetModel
(sentence-transformers' most-used model, all-mpnet-base-v2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from voitta_rag_tpu.models.encoder import (
    PRESETS, _relative_position_bucket, encoder_forward, init_params,
)


def test_relative_position_bucket_matches_hf():
    pytest.importorskip("transformers")
    import torch
    from transformers.models.mpnet.modeling_mpnet import MPNetEncoder

    rel = np.arange(-200, 201).reshape(1, -1)
    ours = np.asarray(_relative_position_bucket(
        jnp.asarray(rel, jnp.int32), num_buckets=32, max_distance=128))
    theirs = MPNetEncoder.relative_position_bucket(
        torch.tensor(rel), num_buckets=32, max_distance=128).numpy()
    np.testing.assert_array_equal(ours, theirs)


def make_mpnet(seed=0):
    import torch
    from transformers import MPNetConfig, MPNetModel

    hf_cfg = MPNetConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=34, pad_token_id=1,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        layer_norm_eps=1e-5, relative_attention_num_buckets=32,
    )
    torch.manual_seed(seed)
    return MPNetModel(hf_cfg).eval()


@pytest.mark.slow
def test_parity_with_torch_mpnet():
    torch = pytest.importorskip("torch")

    model = make_mpnet()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    from voitta_rag_tpu.models.weights import (
        config_from_state_dict, params_from_state_dict,
    )
    cfg = config_from_state_dict(state, hints={"model_type": "mpnet"})
    assert cfg.arch == "mpnet"
    assert cfg.rel_pos_buckets == 32 and cfg.num_heads == 4
    assert cfg.type_vocab_size == 0 and cfg.pos_offset == 2
    params = params_from_state_dict(state, cfg)
    assert "token_type" not in params["embeddings"]

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


def test_mpnet_preset_and_random_init_forward():
    cfg = PRESETS["sentence-transformers/all-mpnet-base-v2"]
    assert cfg.arch == "mpnet" and cfg.rel_pos_buckets == 32
    assert cfg.type_vocab_size == 0 and cfg.vocab_size == 30527
    tiny = type(cfg)(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=34, type_vocab_size=0,
        pad_token_id=1, pos_offset=2, arch="mpnet", rel_pos_buckets=32)
    import jax
    params = init_params(jax.random.PRNGKey(0), tiny)
    assert "rel_bias" in params and "token_type" not in params["embeddings"]
    ids = jnp.asarray(np.ones((1, 8)), jnp.int32)
    out = encoder_forward(params, tiny, ids, jnp.ones((1, 8), jnp.int32),
                          use_pallas_attn=False)
    assert out.shape == (1, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_mpnet_wordpiece_specials(tmp_path):
    """MPNet's vocab.txt carries <s>/</s>/<pad> specials; the WordPiece
    loader resolves them instead of the BERT bracket names."""
    from voitta_rag_tpu.models.tokenizer import WordPieceTokenizer

    vocab_lines = ["<s>", "<pad>", "</s>", "<unk>", "hello", "world", "##s"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab_lines) + "\n")
    tok = WordPieceTokenizer.from_vocab_file(p)
    assert (tok.cls_id, tok.pad_id, tok.sep_id, tok.unk_id) == (0, 1, 2, 3)
    ids, mask = tok.encode_batch(["hello worlds"], 8)
    assert ids[0].tolist()[:5] == [0, 4, 5, 6, 2]
    assert ids[0][5:].tolist() == [1, 1, 1]


def test_embedding_service_end_to_end_with_mpnet_checkpoint(
        tmp_path, temp_root, monkeypatch):
    pytest.importorskip("torch")
    model = make_mpnet(seed=1)
    ckpt = tmp_path / "mpnet-tiny"
    model.save_pretrained(str(ckpt))
    (ckpt / "vocab.txt").write_text("\n".join(
        ["<s>", "<pad>", "</s>", "<unk>", "hello", "world"] +
        [f"tok{i}" for i in range(122)]) + "\n")

    monkeypatch.setenv("EMBEDDING_MODEL_PATH", str(ckpt))
    monkeypatch.setenv("EMBEDDING_MODEL", "mpnet-tiny")
    monkeypatch.setenv("VOITTA_MAX_SEQ_LEN", "16")
    from voitta_rag_tpu.config import get_settings
    get_settings.cache_clear()
    import voitta_rag_tpu.services.embedding as embmod
    embmod.reset_embedding_service()
    try:
        svc = embmod.get_embedding_service()
        vecs = svc.embed_texts_array(["hello world", "world hello hello"])
        assert vecs.shape == (2, 32)
        np.testing.assert_allclose(
            np.linalg.norm(vecs, axis=1), 1.0, atol=1e-3)
        assert svc._cfg.arch == "mpnet"
    finally:
        embmod.reset_embedding_service()
        get_settings.cache_clear()


def test_sharded_train_step_with_mpnet(temp_root, monkeypatch):
    """The dp×tp contrastive train step handles the MPNet param tree
    (no token_type, replicated rel_bias)."""
    import jax
    import numpy as np
    from voitta_rag_tpu.models.encoder import EncoderConfig, init_params
    from voitta_rag_tpu.models.training import (
        make_optimizer, make_sharded_train_step,
    )
    from voitta_rag_tpu.parallel.mesh import train_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    cfg = EncoderConfig(
        vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position=34, type_vocab_size=0,
        pad_token_id=1, pos_offset=2, arch="mpnet", rel_pos_buckets=32)
    mesh = train_mesh(dp=2, tp=2)
    tx = make_optimizer(lr=1e-4, warmup_steps=1, total_steps=4)
    params, opt_state, step = make_sharded_train_step(
        mesh, cfg, tx, init_params(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    mk = lambda: (jnp.asarray(rng.integers(4, 64, (4, 8)), jnp.int32),
                  jnp.ones((4, 8), jnp.int32))
    qi, qm = mk()
    pi, pm = mk()
    params, opt_state, loss = step(params, opt_state, qi, qm, pi, pm)
    assert np.isfinite(float(loss))


def test_mixed_vocab_specials_prefer_angle_framing(tmp_path):
    """Real MPNet vocab.txt contains BOTH angle specials (ids 0-2) and
    BERT's bracket names at shifted ids — framing must use the angle ids
    (HF MPNetTokenizer: cls=<s>=0, sep=</s>=2, pad=<pad>=1, unk=[UNK])."""
    from voitta_rag_tpu.models.tokenizer import WordPieceTokenizer

    vocab_lines = ["<s>", "<pad>", "</s>", "<unk>", "[PAD]", "[UNK]",
                   "[CLS]", "[SEP]", "hello"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab_lines) + "\n")
    tok = WordPieceTokenizer.from_vocab_file(p)
    assert (tok.cls_id, tok.pad_id, tok.sep_id) == (0, 1, 2)
    assert tok.unk_id == 5  # [UNK] wins for unk
