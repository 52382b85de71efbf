"""Import sentence-transformers / HF BERT checkpoints into the JAX encoder.

The reference lazy-loads `SentenceTransformer(model_name)` at first use
(services/embedding.py:24-42). Here checkpoints are read directly from a local
directory (safetensors or torch .bin — torch-cpu is only used as a file
reader) and mapped into the :mod:`voitta_rag_tpu.models.encoder` parameter
pytree. No network access is assumed.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from voitta_rag_tpu.models.encoder import EncoderConfig, Params, stack_layers

logger = logging.getLogger(__name__)


def _strip_prefix(state: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop leading 'bert.' / 'roberta.' / '0.' / 'auto_model.' wrappers."""
    out = {}
    for k, v in state.items():
        for pref in ("0.auto_model.", "auto_model.", "model.", "bert.",
                     "roberta.", "distilroberta.", "mpnet.", "distilbert."):
            if k.startswith(pref):
                k = k[len(pref):]
        out[k] = v
    return out


def _detect_arch(state: dict[str, np.ndarray]) -> str:
    """Arch from raw checkpoint keys or embedding geometry. RoBERTa keeps a
    'roberta.' prefix in plain HF checkpoints; sentence-transformers strips
    it, so fall back to the family's 514-row position table + single token
    type."""
    if any("relative_attention_bias" in k for k in state):
        return "mpnet"
    if any("transformer.layer." in k for k in state):
        return "distilbert"
    if any(".roberta." in f".{k}" for k in state):
        return "roberta"
    s = _strip_prefix(state)
    pos = s.get("embeddings.position_embeddings.weight")
    tt = s.get("embeddings.token_type_embeddings.weight")
    if pos is not None and tt is not None and pos.shape[0] % 4 == 2 \
            and tt.shape[0] == 1:
        # 514/130/1026-row position tables: a power-of-two usable length
        # plus the two reserved rows.
        return "roberta"
    return "bert"


def load_state_dict(model_dir: str | Path) -> dict[str, np.ndarray]:
    """Read a checkpoint file from a model directory into numpy arrays."""
    p = Path(model_dir)
    candidates = [
        p / "model.safetensors", p / "0_Transformer" / "model.safetensors",
        p / "pytorch_model.bin", p / "0_Transformer" / "pytorch_model.bin",
    ]
    for c in candidates:
        if not c.exists():
            continue
        if c.suffix == ".safetensors":
            from safetensors.numpy import load_file

            return _strip_prefix(load_file(str(c)))
        import torch

        sd = torch.load(str(c), map_location="cpu", weights_only=True)
        return _strip_prefix({k: v.numpy() for k, v in sd.items()})
    raise FileNotFoundError(f"no checkpoint found under {model_dir}")


def params_from_state_dict(
    state: dict[str, np.ndarray], cfg: EncoderConfig
) -> Params:
    """Map HF BERT names → encoder pytree. Linear weights are [out, in] in
    torch; the encoder stores [in, out] kernels, so they are transposed."""
    state = _strip_prefix(state)
    dt = jnp.dtype(cfg.dtype)

    def t(name):  # transposed linear weight
        return jnp.asarray(state[name].T, dt)

    def a(name):
        return jnp.asarray(state[name], dt)

    def dense(prefix):
        return {"kernel": t(f"{prefix}.weight"), "bias": a(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": a(f"{prefix}.weight"), "bias": a(f"{prefix}.bias")}

    params: Params = {
        "embeddings": {
            "word": a("embeddings.word_embeddings.weight"),
            "position": a("embeddings.position_embeddings.weight"),
            "ln": ln("embeddings.LayerNorm"),
        },
    }
    if "embeddings.token_type_embeddings.weight" in state:
        params["embeddings"]["token_type"] = a(
            "embeddings.token_type_embeddings.weight")
    if "encoder.relative_attention_bias.weight" in state:
        params["rel_bias"] = a("encoder.relative_attention_bias.weight")
    layers = []
    for i in range(cfg.num_layers):
        if cfg.arch == "distilbert":
            # DistilBERT layer keys: transformer.layer.N.attention.{q,k,v,
            # out}_lin with sa_layer_norm / ffn.lin1+lin2 / output_layer_norm
            # (HF DistilBertModel naming — structurally the same post-LN
            # block as BERT, so it maps onto the same pytree).
            pre = f"transformer.layer.{i}"
            layers.append({
                "attn": {
                    "q": dense(f"{pre}.attention.q_lin"),
                    "k": dense(f"{pre}.attention.k_lin"),
                    "v": dense(f"{pre}.attention.v_lin"),
                    "o": dense(f"{pre}.attention.out_lin"),
                    "ln": ln(f"{pre}.sa_layer_norm"),
                },
                "mlp": {
                    "up": dense(f"{pre}.ffn.lin1"),
                    "down": dense(f"{pre}.ffn.lin2"),
                    "ln": ln(f"{pre}.output_layer_norm"),
                },
            })
            continue
        pre = f"encoder.layer.{i}"
        if cfg.arch == "mpnet":
            # MPNet attention keys: attention.attn.{q,k,v,o} with the
            # LayerNorm directly under attention.
            attn = {
                "q": dense(f"{pre}.attention.attn.q"),
                "k": dense(f"{pre}.attention.attn.k"),
                "v": dense(f"{pre}.attention.attn.v"),
                "o": dense(f"{pre}.attention.attn.o"),
                "ln": ln(f"{pre}.attention.LayerNorm"),
            }
        else:
            attn = {
                "q": dense(f"{pre}.attention.self.query"),
                "k": dense(f"{pre}.attention.self.key"),
                "v": dense(f"{pre}.attention.self.value"),
                "o": dense(f"{pre}.attention.output.dense"),
                "ln": ln(f"{pre}.attention.output.LayerNorm"),
            }
        layers.append({
            "attn": attn,
            "mlp": {
                "up": dense(f"{pre}.intermediate.dense"),
                "down": dense(f"{pre}.output.dense"),
                "ln": ln(f"{pre}.output.LayerNorm"),
            },
        })
    params["layers"] = stack_layers(layers)
    return params


def config_from_state_dict(
    state: dict[str, np.ndarray], hints: dict | None = None
) -> EncoderConfig:
    """Infer encoder geometry from checkpoint shapes (+ optional HF
    config.json ``hints`` for heads / layer-norm eps)."""
    arch = _detect_arch(state)
    state = _strip_prefix(state)
    hints = hints or {}
    # config.json is authoritative when present: the geometry fallback in
    # _detect_arch (514-row positions + single token type → roberta) would
    # otherwise misclassify an unconventional BERT checkpoint and silently
    # shift pos_offset/pad_token_id.
    model_type = hints.get("model_type")
    if model_type in ("roberta", "xlm-roberta", "camembert"):
        arch = "roberta"
    elif model_type == "mpnet":
        arch = "mpnet"
    elif model_type == "distilbert":
        arch = "distilbert"
    elif model_type == "bert":
        arch = "bert"
    logger.info("encoder arch: %s (model_type hint: %s)", arch, model_type)
    vocab, hidden = state["embeddings.word_embeddings.weight"].shape
    max_pos = state["embeddings.position_embeddings.weight"].shape[0]
    tt = state.get("embeddings.token_type_embeddings.weight")
    type_vocab = tt.shape[0] if tt is not None else 0
    if arch == "distilbert":
        inter = state["transformer.layer.0.ffn.lin1.weight"].shape[0]
        layer_key = "transformer.layer.{}.attention.q_lin.weight"
    else:
        inter = state["encoder.layer.0.intermediate.dense.weight"].shape[0]
        attn_q = ("attention.attn.q" if arch == "mpnet"
                  else "attention.self.query")
        layer_key = f"encoder.layer.{{}}.{attn_q}.weight"
    n_layers = 0
    while layer_key.format(n_layers) in state:
        n_layers += 1
    rel = state.get("encoder.relative_attention_bias.weight")
    # Heads: the rel-bias table's second axis IS the head count (MPNet);
    # else config.json, else assume head_dim 64.
    if rel is not None:
        num_heads = rel.shape[1]
    else:
        # DistilBertConfig names the head count ``n_heads``; BERT/RoBERTa
        # use ``num_attention_heads``.
        num_heads = int(hints.get("num_attention_heads",
                                  hints.get("n_heads",
                                            max(hidden // 64, 1))))
    eps = float(hints.get(
        "layer_norm_eps",
        1e-12 if arch in ("bert", "distilbert") else 1e-5))
    return EncoderConfig(
        vocab_size=vocab, hidden_size=hidden, num_layers=n_layers,
        num_heads=num_heads, intermediate_size=inter, max_position=max_pos,
        type_vocab_size=type_vocab, layer_norm_eps=eps,
        pad_token_id=int(hints.get(
            "pad_token_id", 0 if arch in ("bert", "distilbert") else 1)),
        pos_offset=0 if arch in ("bert", "distilbert") else 2, arch=arch,
        rel_pos_buckets=rel.shape[0] if rel is not None else 0,
        rel_pos_max_distance=int(hints.get(
            "relative_attention_max_distance", 128)),
    )


def _config_hints(model_dir: str | Path) -> dict:
    import json

    p = Path(model_dir)
    for cand in (p / "config.json", p / "0_Transformer" / "config.json"):
        if cand.exists():
            try:
                return json.loads(cand.read_text())
            except ValueError:
                pass
    return {}


def load_encoder(model_dir: str | Path) -> tuple[EncoderConfig, Params]:
    state = load_state_dict(model_dir)
    cfg = config_from_state_dict(state, hints=_config_hints(model_dir))
    return cfg, params_from_state_dict(state, cfg)


# ---------------------------------------------------------------------------
# native checkpoints (fine-tuned encoders; checkpoint/resume for training)
# ---------------------------------------------------------------------------

def save_checkpoint(path: str | Path, cfg: EncoderConfig, params: Params) -> None:
    """Save a fine-tuned encoder as a flat .npz + config json."""
    import json

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node, np.float32)

    walk("", params)
    np.savez_compressed(path / "encoder.npz", **flat)
    (path / "encoder_config.json").write_text(json.dumps(cfg.__dict__))


def load_checkpoint(path: str | Path) -> tuple[EncoderConfig, Params]:
    """Load a checkpoint written by :func:`save_checkpoint`. Legacy
    checkpoints with list-of-layers keys (``layers/0/attn/...``) are stacked
    on load."""
    import json

    path = Path(path)
    cfg = EncoderConfig(**json.loads(
        (path / "encoder_config.json").read_text()))
    dt = jnp.dtype(cfg.dtype)
    params: Params = {}
    with np.load(path / "encoder.npz") as data:
        for key in data.files:
            parts = key.split("/")
            node = params
            for i, p in enumerate(parts[:-1]):
                nxt = parts[i + 1]
                key_p = int(p) if p.isdigit() else p
                if isinstance(node, list):
                    while len(node) <= key_p:
                        node.append(None)
                    if node[key_p] is None:
                        node[key_p] = [] if nxt.isdigit() else {}
                    node = node[key_p]
                else:
                    if key_p not in node:
                        node[key_p] = [] if nxt.isdigit() else {}
                    node = node[key_p]
            leaf = jnp.asarray(data[key], dt)
            if isinstance(node, list):
                idx = int(parts[-1])
                while len(node) <= idx:
                    node.append(None)
                node[idx] = leaf
            else:
                node[parts[-1]] = leaf
    if isinstance(params.get("layers"), list):  # legacy layout
        params["layers"] = stack_layers(params["layers"])
    return cfg, params
