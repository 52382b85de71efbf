"""Learned-retrieval proof: train -> embed -> index -> search, offline.

Every recall number the bench reports for real text is measured on a
RANDOM-INIT encoder (no pretrained checkpoint exists in this offline image —
the reference gets its semantics from frozen intfloat/e5-base-v2 weights,
/root/reference/src/voitta/config.py:33-36 + services/embedding.py:24-42).
This module converts that disclaimer into a demonstrated capability the
reference does not have: the in-repo dp x tp contrastive stack
(models/training.py) fine-tunes an encoder ON the harvested real-text corpus,
and held-out recall@10 of the trained dense (and trained hybrid) path through
the production scan kernels is compared against BM25-only and the random-init
encoder.

Task construction (self-supervised, zero annotations):
  * documents = real files chunked by the production chunker, grouped by file
  * a training/eval example pairs a synthesized QUERY — the document's title
    line plus a few content words sampled from the chunk's NEIGHBOR — with
    the chunk itself as the positive PASSAGE. Neighbor-sourced query words
    make the task topical rather than copy-matching: BM25's best lexical
    match for the query words is the neighbor, not the target, so beating
    BM25 requires learning document-level co-occurrence structure.
  * the split is BY DOCUMENT: eval queries target chunks of documents the
    encoder never saw in training.

Scoring: recall@10 where a hit is retrieving the target chunk or any chunk
with byte-identical text (real corpora carry duplicated licenses/boilerplate;
crediting exact duplicates avoids punishing a correct retrieval for picking
the other copy).

The trained encoder's serving path is the production one: int8-quantized
rows, the fused masked dense-scan kernel, and hybrid fusion with the
production BM25 pipeline (search/sparse_text.py).
"""

from __future__ import annotations

import pathlib
import re
import site
import time
import zlib
from dataclasses import dataclass

import numpy as np

WORD_RE = re.compile(r"\w+|[^\w\s]")
# Harvest roots: installed package sources + system docs (same as
# bench.py::bench_real_corpus — deterministic on a given image).
HARVEST_EXTS = {".py", ".md", ".rst", ".txt", ".cfg", ".toml", ".json"}


def harvest_docs(target_chunks: int, *, chunk_size: int = 800,
                 chunk_overlap: int = 200,
                 min_doc_chunks: int = 2) -> list[list[str]]:
    """Real files -> production-chunked documents (list of chunk texts).

    Stops once ``target_chunks`` chunks are collected. Documents shorter
    than ``min_doc_chunks`` are dropped (no neighbor to mine a query from).
    """
    from voitta_rag_tpu.services.chunking import ChunkingService

    chunker = ChunkingService(chunk_size=chunk_size,
                              chunk_overlap=chunk_overlap)
    roots = [pathlib.Path(p) for p in site.getsitepackages()]
    roots.append(pathlib.Path("/usr/share/doc"))
    docs: list[list[str]] = []
    n = 0
    for root in roots:
        if n >= target_chunks:
            break
        if not root.exists():
            continue
        for p in sorted(root.rglob("*")):
            if n >= target_chunks:
                break
            if not (p.is_file() and (p.suffix in HARVEST_EXTS
                                     or p.name in ("LICENSE", "copyright"))):
                continue
            try:
                text = p.read_text(errors="ignore")
            except OSError:
                continue
            if not (256 <= len(text) <= 2_000_000):
                continue
            chunks = [c.text for c in chunker.chunk_text(text)]
            if len(chunks) < min_doc_chunks:
                continue
            docs.append(chunks)
            n += len(chunks)
    return docs


def _title_of(doc: list[str]) -> str:
    for line in doc[0].splitlines():
        line = line.strip().strip("#=*- ")
        if len(line) >= 4:
            return " ".join(WORD_RE.findall(line.lower())[:8])
    return ""


def synth_query(doc: list[str], i: int, rng: np.random.Generator,
                n_words: int = 6) -> str:
    """Title words + content words sampled from the chunk's NEIGHBOR."""
    nb = doc[i - 1] if i > 0 else doc[i + 1]
    words = [w for w in WORD_RE.findall(nb.lower())
             if len(w) > 3 and not w.isdigit()]
    if words:
        pick = rng.choice(len(words), min(n_words, len(words)),
                          replace=False)
        sampled = " ".join(words[j] for j in sorted(pick))
    else:
        sampled = ""
    return (_title_of(doc) + " " + sampled).strip()


@dataclass
class RetrievalTask:
    """Doc-split self-supervised retrieval task over a real corpus."""

    corpus: list[str]            # all chunks (the searchable index)
    chunk_doc: np.ndarray        # [N] doc id per chunk
    train_pairs: list[tuple[str, str]]   # (query, passage)
    eval_queries: list[str]
    eval_targets: np.ndarray     # [Q] corpus row of each target chunk
    eval_doc_ids: frozenset[int] = frozenset()  # held-out documents
    # (doc, chunk) refs of the training passages — the ONLINE trainer
    # resynthesizes a fresh query per (ref, step), so no two epochs see
    # the same query for a passage (the static train_pairs memorize).
    train_refs: tuple = ()


def build_task(docs: list[list[str]], *, eval_docs_frac: float = 0.1,
               max_eval: int = 512, max_train_pairs: int = 300_000,
               seed: int = 0) -> RetrievalTask:
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(docs))
    n_eval_docs = max(8, int(len(docs) * eval_docs_frac))
    eval_ids = set(order[:n_eval_docs].tolist())

    corpus: list[str] = []
    chunk_doc: list[int] = []
    train_pairs: list[tuple[str, str]] = []
    train_refs: list[tuple[int, int]] = []
    eval_queries: list[str] = []
    eval_targets: list[int] = []
    for d, doc in enumerate(docs):
        base = len(corpus)
        corpus.extend(doc)
        chunk_doc.extend([d] * len(doc))
        is_eval = d in eval_ids
        for i in range(len(doc)):
            q = synth_query(doc, i, rng)
            if len(q.split()) < 3:
                continue
            if is_eval:
                eval_queries.append(q)
                eval_targets.append(base + i)
            elif len(train_pairs) < max_train_pairs:
                train_pairs.append((q, doc[i]))
                train_refs.append((d, i))
    if len(eval_queries) > max_eval:
        keep = rng.choice(len(eval_queries), max_eval, replace=False)
        keep = np.sort(keep)
        eval_queries = [eval_queries[j] for j in keep]
        eval_targets = [eval_targets[j] for j in keep]
    perm = rng.permutation(len(train_pairs))
    train_pairs = [train_pairs[j] for j in perm]
    train_refs = [train_refs[j] for j in perm]
    return RetrievalTask(corpus=corpus,
                         chunk_doc=np.asarray(chunk_doc, np.int32),
                         train_pairs=train_pairs,
                         eval_queries=eval_queries,
                         eval_targets=np.asarray(eval_targets, np.int64),
                         eval_doc_ids=frozenset(eval_ids),
                         train_refs=tuple(train_refs))


def crc_tokenize(texts: list[str], vocab_size: int, max_len: int,
                 pad_id: int = 0) -> np.ndarray:
    """CRC-hashed word->id tokenizer (bench.py's deterministic vocab)."""
    out = np.full((len(texts), max_len), pad_id, np.int32)
    for i, t in enumerate(texts):
        out[i, 0] = 1
        for j, w in enumerate(WORD_RE.findall(t.lower())[:max_len - 1]):
            out[i, j + 1] = 2 + (zlib.crc32(w.encode())
                                 % (vocab_size - 2))
    return out


def train_encoder(pairs: list[tuple[str, str]], cfg, *, steps: int,
                  batch: int, max_len: int = 72, lr: float = 3e-4,
                  dp: int | None = None, tp: int = 1, seed: int = 0,
                  log=None, time_left=None):
    """dp x tp contrastive fine-tune (models/training.py) from random init.

    Returns (params, losses). One pass tokenizes all pairs up front (the
    CRC vocab needs no trained tokenizer); batches cycle with reshuffles.
    """
    import jax
    import jax.numpy as jnp

    from voitta_rag_tpu.models.encoder import init_params
    from voitta_rag_tpu.models.training import (
        make_optimizer, make_sharded_train_step,
    )
    from voitta_rag_tpu.parallel.mesh import train_mesh

    q_ids = crc_tokenize([q for q, _ in pairs], cfg.vocab_size, max_len)
    p_ids = crc_tokenize([p for _, p in pairs], cfg.vocab_size, max_len)
    mesh = train_mesh(dp=dp, tp=tp)
    dp_n = mesh.shape["dp"]
    batch -= batch % dp_n or 0
    tx = make_optimizer(lr=lr, warmup_steps=min(100, steps // 10 + 1),
                        total_steps=steps)
    params, opt_state, step_fn = make_sharded_train_step(
        mesh, cfg, tx, init_params(jax.random.PRNGKey(seed), cfg))

    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pairs))
    pos = 0
    losses = []
    for s in range(steps):
        if pos + batch > len(order):
            order = rng.permutation(len(pairs))
            pos = 0
        take = order[pos:pos + batch]
        pos += batch
        qb = jnp.asarray(q_ids[take])
        pb = jnp.asarray(p_ids[take])
        params, opt_state, loss = step_fn(
            params, opt_state, qb, (qb != 0).astype(jnp.int32),
            pb, (pb != 0).astype(jnp.int32))
        if s % 50 == 0 or s == steps - 1:
            losses.append(float(loss))
            if log:
                log(f"train step {s}: loss {losses[-1]:.4f}")
            if time_left is not None and time_left() < 60 and s < steps - 1:
                if log:
                    log(f"training stopped early at step {s} (deadline)")
                break
    return params, losses


def train_encoder_online(docs: list[list[str]], refs, cfg, *, steps: int,
                         batch: int, max_len: int = 72, lr: float = 3e-4,
                         dp: int | None = None, tp: int = 1, seed: int = 0,
                         log=None, time_left=None):
    """Contrastive training with ONLINE query synthesis (no memorization).

    Each step draws a fresh batch of (doc, chunk) refs and synthesizes a
    NEW query for every passage (different neighbor-word sample each time),
    so the model never sees the same (query, passage) pair twice — the
    static-pair trainer measured 0.05 train loss and flat held-out recall
    (classic memorization at ~9 epochs over fixed pairs). Passage tokens
    are pre-tokenized once; query tokenization is CRC hashing, ~ms/batch.
    """
    import jax
    import jax.numpy as jnp

    from voitta_rag_tpu.models.encoder import init_params
    from voitta_rag_tpu.models.training import (
        make_optimizer, make_sharded_train_step,
    )
    from voitta_rag_tpu.parallel.mesh import train_mesh

    p_texts = [docs[d][i] for d, i in refs]
    p_ids = crc_tokenize(p_texts, cfg.vocab_size, max_len)
    mesh = train_mesh(dp=dp, tp=tp)
    dp_n = mesh.shape["dp"]
    batch -= batch % dp_n or 0
    tx = make_optimizer(lr=lr, warmup_steps=min(100, steps // 10 + 1),
                        total_steps=steps)
    params, opt_state, step_fn = make_sharded_train_step(
        mesh, cfg, tx, init_params(jax.random.PRNGKey(seed), cfg))

    rng = np.random.default_rng(seed)
    losses = []
    for s in range(steps):
        take = rng.choice(len(refs), batch, replace=False)
        q_texts = [synth_query(docs[refs[j][0]], refs[j][1], rng)
                   for j in take]
        q_ids = crc_tokenize(q_texts, cfg.vocab_size, max_len)
        qb = jnp.asarray(q_ids)
        pb = jnp.asarray(p_ids[take])
        params, opt_state, loss = step_fn(
            params, opt_state, qb, (qb != 0).astype(jnp.int32),
            pb, (pb != 0).astype(jnp.int32))
        if s % 50 == 0 or s == steps - 1:
            losses.append(float(loss))
            if log:
                log(f"train step {s}: loss {losses[-1]:.4f}")
            if time_left is not None and time_left() < 60 and s < steps - 1:
                if log:
                    log(f"training stopped early at step {s} (deadline)")
                break
    return params, losses


def train_encoder_hardneg(docs: list[list[str]], refs, cfg, *, steps: int,
                          batch: int, max_len: int = 96, lr: float = 3e-4,
                          dp: int | None = None, tp: int = 1, seed: int = 0,
                          log=None, time_left=None, eval_every: int = 0,
                          eval_fn=None, init=None):
    """Online-synthesis training with NEIGHBOR hard negatives.

    The held-out failure mode of the plain in-batch trainer is exactly the
    one the task was designed to expose: a query's words are sampled from
    the target chunk's NEIGHBOR, so BM25 ranks the neighbor first — and a
    dense model trained only against random in-batch negatives never learns
    to prefer the target over that lexical decoy (r4: dense 0.231 < BM25
    0.288). Here every batch is built as anchor/neighbor PAIRS: for each
    sampled ref (d, i) the batch also contains a same-doc neighbor ref, so
    the InfoNCE denominator always holds the decoy passage and the gradient
    pushes q_i off p_{i±1} explicitly. Both halves are full training
    examples (fresh queries each), so no throughput is wasted.

    Byte-identical passages inside one batch are false negatives (two
    correct labels); duplicates are re-rolled to random refs.

    ``eval_every``/``eval_fn(params) -> float`` checkpoints the best params
    by a caller-supplied validation metric (returned alongside the final).
    """
    import jax
    import jax.numpy as jnp

    from voitta_rag_tpu.models.encoder import init_params
    from voitta_rag_tpu.models.training import (
        make_optimizer, make_sharded_train_step,
    )
    from voitta_rag_tpu.parallel.mesh import train_mesh

    p_texts = [docs[d][i] for d, i in refs]
    p_ids = crc_tokenize(p_texts, cfg.vocab_size, max_len)
    p_crc = np.asarray([zlib.crc32(t.encode()) for t in p_texts], np.int64)
    ref_pos = {r: j for j, r in enumerate(refs)}

    def neighbor_of(j: int) -> int:
        d, i = refs[j]
        for cand in ((d, i - 1), (d, i + 1)):
            k = ref_pos.get(cand)
            if k is not None:
                return k
        return -1

    nbr = np.asarray([neighbor_of(j) for j in range(len(refs))], np.int64)
    p_texts = None

    # Precompute the query components as TOKEN IDS (one findall pass per
    # doc/ref up front): per-step synthesis is then pure array assembly.
    # String-level parity with synth_query/crc_tokenize holds because
    # WORD_RE words contain no whitespace, so tokenizing words one at a
    # time equals tokenizing the joined query string.
    def _tok(w: str) -> int:
        return 2 + (zlib.crc32(w.encode()) % (cfg.vocab_size - 2))

    title_ids = [[_tok(w) for w in _title_of(doc).split()] for doc in docs]
    cand_ids: list[np.ndarray] = []
    for d, i in refs:
        doc = docs[d]
        nb_text = doc[i - 1] if i > 0 else doc[i + 1]
        ws = [w for w in WORD_RE.findall(nb_text.lower())
              if len(w) > 3 and not w.isdigit()]
        cand_ids.append(np.asarray([_tok(w) for w in ws], np.int32))

    def make_query_ids(take: np.ndarray) -> np.ndarray:
        out = np.zeros((len(take), max_len), np.int32)
        out[:, 0] = 1
        for r, j in enumerate(take):
            t = title_ids[refs[j][0]]
            cand = cand_ids[j]
            if len(cand):
                pick = rng.choice(len(cand), min(6, len(cand)),
                                  replace=False)
                q = t + cand[np.sort(pick)].tolist()
            else:
                q = list(t)
            q = q[:max_len - 1]
            out[r, 1:1 + len(q)] = q
        return out

    mesh = train_mesh(dp=dp, tp=tp)
    dp_n = mesh.shape["dp"]
    batch -= batch % max(2, dp_n)
    half = batch // 2
    tx = make_optimizer(lr=lr, warmup_steps=min(500, steps // 10 + 1),
                        total_steps=steps)
    # Per-layer remat: a b=512 hardneg step OOMs 25.7 GB without it (all-
    # layer attention probs held for backward); with it the step fits a
    # single 16 GB chip with room to spare.
    params, opt_state, step_fn = make_sharded_train_step(
        mesh, cfg, tx, init_params(jax.random.PRNGKey(seed), cfg)
        if init is None else init, use_remat=True)

    rng = np.random.default_rng(seed)
    losses = []
    best = (-1.0, None)
    for s in range(steps):
        anchors = rng.choice(len(refs), half, replace=False)
        mates = nbr[anchors]
        miss = mates < 0
        if miss.any():
            mates[miss] = rng.choice(len(refs), int(miss.sum()))
        take = np.concatenate([anchors, mates])
        # Re-roll in-batch byte-identical passages (false negatives).
        seen: dict[int, int] = {}
        for t in range(len(take)):
            c = int(p_crc[take[t]])
            while c in seen and seen[c] != take[t]:
                take[t] = int(rng.choice(len(refs)))
                c = int(p_crc[take[t]])
            seen[c] = take[t]
        qb = jnp.asarray(make_query_ids(take))
        pb = jnp.asarray(p_ids[take])
        params, opt_state, loss = step_fn(
            params, opt_state, qb, (qb != 0).astype(jnp.int32),
            pb, (pb != 0).astype(jnp.int32))
        if s % 50 == 0 or s == steps - 1:
            losses.append(float(loss))
            if log:
                log(f"train step {s}: loss {losses[-1]:.4f}")
            if time_left is not None and time_left() < 60 and s < steps - 1:
                if log:
                    log(f"training stopped early at step {s} (deadline)")
                break
        if eval_every and eval_fn and (s + 1) % eval_every == 0:
            m = eval_fn(params)
            if log:
                log(f"  eval at step {s + 1}: {m:.4f}"
                    f" (best {max(best[0], m):.4f})")
            if m > best[0]:
                best = (m, jax.tree.map(np.asarray, params))
    return params, losses, best


def save_checkpoint(path, params, **meta) -> None:
    """Flatten a params pytree to an npz (f16 floats) + JSON metadata."""
    import json as _json

    import jax

    flat, treedef = jax.tree.flatten(jax.tree.map(np.asarray, params))
    arrs = {f"p{i}": (a.astype(np.float16)
                      if a.dtype in (np.float32, np.float64) else a)
            for i, a in enumerate(flat)}
    np.savez_compressed(path, __meta__=_json.dumps(meta),
                        __n__=len(flat), **arrs)


def load_checkpoint(path, cfg):
    """Returns (params_f32_pytree, meta dict); structure from init_params."""
    import json as _json

    import jax

    from voitta_rag_tpu.models.encoder import init_params

    z = np.load(path, allow_pickle=False)
    meta = _json.loads(str(z["__meta__"]))
    n = int(z["__n__"])
    flat = [np.asarray(z[f"p{i}"]) for i in range(n)]
    flat = [a.astype(np.float32) if a.dtype == np.float16 else a
            for a in flat]
    treedef = jax.tree.structure(init_params(jax.random.PRNGKey(0), cfg))
    return jax.tree.unflatten(treedef, flat), meta


def checkpoint_meta(path) -> dict | None:
    """JSON metadata of an owned .npz retrieval checkpoint, else None.

    Cheap: npz entries load lazily, so only the small ``__meta__`` string is
    decompressed — callers (config resolution, serving) can probe a
    checkpoint without paying for the 40 MB parameter payload.
    """
    import json as _json

    try:
        z = np.load(path, allow_pickle=False)
        return _json.loads(str(z["__meta__"]))
    except Exception:
        return None


def load_checkpoint_auto(path):
    """(cfg, params, meta) from an owned .npz checkpoint, preset-resolved.

    ``load_checkpoint`` needs the encoder config up front to rebuild the
    params tree structure; here the config comes from the checkpoint's own
    ``preset`` metadata (scripts/train_retrieval_ckpt.py stamps it), so the
    serving layer can load any owned checkpoint by path alone.
    """
    from voitta_rag_tpu.models.encoder import PRESETS

    meta = checkpoint_meta(path)
    if meta is None:
        raise ValueError(f"not an owned retrieval checkpoint: {path}")
    cfg = PRESETS[meta.get("preset",
                           "sentence-transformers/all-MiniLM-L6-v2")]
    params, meta = load_checkpoint(path, cfg)
    return cfg, params, meta


def encode_corpus(params, cfg, ids: np.ndarray, *, block: int = 256):
    """Unit-normalized embeddings of pre-tokenized rows, blocked on device.

    Returns a device f32 [N, H] array (caller quantizes for serving).
    """
    import jax
    import jax.numpy as jnp

    from voitta_rag_tpu.models.encoder import encode_tokens

    @jax.jit
    def enc(params, ids):
        mask = (ids != 0).astype(jnp.int32)
        return encode_tokens(params, cfg, ids, mask).astype(jnp.float32)

    n = len(ids)
    pad = (-n) % block
    if pad:
        ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), np.int32)])
        ids[n:, 0] = 1  # non-empty rows keep the mask well-formed
    parts = [enc(params, jnp.asarray(ids[lo:lo + block]))
             for lo in range(0, len(ids), block)]
    return jnp.concatenate(parts, axis=0)[:n]


def recall_at10(retrieved: np.ndarray, targets: np.ndarray,
                corpus: list[str]) -> float:
    """Hit = target row retrieved, or any row with byte-identical text."""
    text_hash = np.asarray([zlib.crc32(t.encode()) for t in corpus],
                           np.int64)
    hits = 0
    for b in range(len(targets)):
        want = int(targets[b])
        rows = [int(r) for r in retrieved[b] if r >= 0]
        if want in rows or any(
                text_hash[r] == text_hash[want]
                and corpus[r] == corpus[want] for r in rows):
            hits += 1
    return hits / max(len(targets), 1)
