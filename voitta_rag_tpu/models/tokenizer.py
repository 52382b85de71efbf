"""Self-contained WordPiece tokenization (no external tokenizer dependency).

The reference delegates tokenization to sentence-transformers/HF; here it is
implemented from scratch so the framework is standalone: a BasicTokenizer
(lowercase, accent strip, punctuation split, CJK spacing) + greedy
longest-match WordPiece, matching the BERT tokenization used by the
e5/MiniLM/bge families. When no ``vocab.txt`` is available (air-gapped
deploys), :class:`HashTokenizer` provides a deterministic hashed-id fallback
so the full pipeline still runs (embeddings then come from the
deterministic-random encoder init).
"""

from __future__ import annotations

import hashlib
import unicodedata
from pathlib import Path

import numpy as np

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0xF900 <= cp <= 0xFAFF
    )


def basic_tokenize(text: str, lowercase: bool = True) -> list[str]:
    """Whitespace + punctuation + CJK split with accent stripping."""
    out = []
    for ch in text:
        cp = ord(ch)
        if ch.isspace():
            out.append(" ")
        elif cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in ("Cc", "Cf"):
            continue
        elif _is_cjk(cp):
            out.append(f" {ch} ")
        else:
            out.append(ch)
    text = "".join(out)
    if lowercase:
        text = text.lower()
        text = unicodedata.normalize("NFD", text)
        text = "".join(c for c in text if unicodedata.category(c) != "Mn")
    tokens: list[str] = []
    for tok in text.split():
        cur = ""
        for ch in tok:
            if _is_punctuation(ch):
                if cur:
                    tokens.append(cur)
                    cur = ""
                tokens.append(ch)
            else:
                cur += ch
        if cur:
            tokens.append(cur)
    return tokens



def _frame_batch(tokenize_ids, cls_id: int, sep_id: int, pad_id: int,
                 texts: list[str], max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared CLS/BOS + ids + SEP/EOS framing with pad + mask (one
    implementation for all tokenizer families)."""
    B = len(texts)
    input_ids = np.full((B, max_len), pad_id, np.int32)
    mask = np.zeros((B, max_len), np.int32)
    for i, text in enumerate(texts):
        ids = tokenize_ids(text)[: max_len - 2]
        row = [cls_id] + ids + [sep_id]
        input_ids[i, : len(row)] = row
        mask[i, : len(row)] = 1
    return input_ids, mask


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a BERT vocab."""

    def __init__(self, vocab: dict[str, int], lowercase: bool = True,
                 max_word_chars: int = 100):
        self.vocab = vocab
        self.lowercase = lowercase
        self.max_word_chars = max_word_chars

        def special(*names, default):
            for n in names:
                if n in vocab:
                    return vocab[n]
            return default

        # MPNet vocabs contain BOTH the angle specials (<s>/<pad>/</s> at
        # ids 0-2, the ones HF MPNetTokenizer frames with) AND BERT's
        # bracket names at shifted ids — so angle names take priority for
        # framing tokens, but ONLY when the vocab actually has the MPNet
        # layout (<s>=0, <pad>=1).  A custom BERT vocab that merely happens
        # to contain '<s>' or '<pad>' as ordinary tokens keeps the bracket
        # specials.  UNK is the exception either way: HF MPNet keeps
        # unk_token="[UNK]", so brackets win there.
        mpnet_layout = vocab.get("<s>") == 0 and vocab.get("<pad>") == 1
        if mpnet_layout:
            self.pad_id = special("<pad>", PAD, default=0)
            self.cls_id = special("<s>", CLS, default=2)
            self.sep_id = special("</s>", SEP, default=3)
        else:
            self.pad_id = special(PAD, "<pad>", default=0)
            self.cls_id = special(CLS, "<s>", default=2)
            self.sep_id = special(SEP, "</s>", default=3)
        self.unk_id = special(UNK, "<unk>", default=1)
        self._native_state: bool | None = None

    @classmethod
    def from_vocab_file(cls, path: str | Path, **kw) -> "WordPieceTokenizer":
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kw)

    @property
    def vocab_size(self) -> int:
        return max(self.vocab.values()) + 1

    def wordpiece(self, word: str) -> list[int]:
        if len(word) > self.max_word_chars:
            return [self.unk_id]
        ids: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = self.vocab[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def tokenize_ids(self, text: str) -> list[int]:
        # C++ fast path for ASCII inputs (native/voitta_native.cpp mirrors
        # the ASCII subset of these rules exactly; tests/test_native.py).
        if self.lowercase and self._native_ready():
            from voitta_rag_tpu.utils import native

            ids = native.wp_encode(text, self.unk_id, self.max_word_chars)
            if ids is not None:
                return ids
        ids = []
        for tok in basic_tokenize(text, self.lowercase):
            ids.extend(self.wordpiece(tok))
        return ids

    def _native_ready(self) -> bool:
        if self._native_state is None:
            try:
                from voitta_rag_tpu.utils import native

                self._native_state = native.wp_load(self.vocab, id(self))
            except Exception:
                self._native_state = False
        return self._native_state

    def encode_batch(
        self, texts: list[str], max_len: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (input_ids [B, max_len] int32, attention_mask [B, max_len] int32)
        with [CLS] ... [SEP] framing and truncation."""
        return _frame_batch(self.tokenize_ids, self.cls_id, self.sep_id,
                            self.pad_id, texts, max_len)


class HashTokenizer:
    """Deterministic hashed-id tokenizer (no vocab file required).

    Token ids are stable across processes (md5-based, not Python ``hash``).
    Ids 0-3 are reserved for PAD/UNK/CLS/SEP.
    """

    RESERVED = 4

    def __init__(self, vocab_size: int = 30522, lowercase: bool = True):
        self._vocab_size = vocab_size
        self.lowercase = lowercase
        self.pad_id, self.unk_id, self.cls_id, self.sep_id = 0, 1, 2, 3

    @property
    def vocab_size(self) -> int:
        return self._vocab_size

    def _hash_id(self, token: str) -> int:
        h = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "little")
        return self.RESERVED + h % (self._vocab_size - self.RESERVED)

    def tokenize_ids(self, text: str) -> list[int]:
        return [self._hash_id(t) for t in basic_tokenize(text, self.lowercase)]

    def encode_batch(
        self, texts: list[str], max_len: int
    ) -> tuple[np.ndarray, np.ndarray]:
        return _frame_batch(self.tokenize_ids, self.cls_id, self.sep_id,
                            self.pad_id, texts, max_len)


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte→printable-unicode table (the published byte-level BPE
    alphabet): printable latin-1 bytes map to themselves, the rest to
    256+n codepoints, so every byte has a lossless 1-char representation."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class ByteLevelBpeTokenizer:
    """GPT-2-style byte-level BPE (the RoBERTa tokenizer family), from the
    published algorithm: vocab.json token→id plus ranked merges.txt pairs;
    pre-tokenization by the GPT-2 regex; greedy lowest-rank pair merging.

    Specials follow the RoBERTa convention (<s>/<pad>/</s>/<unk>); framing
    is ``<s> ... </s>`` with ``<pad>`` fill.
    """

    def __init__(self, vocab: dict[str, int],
                 merges: list[tuple[str, str]]):
        import regex

        self.vocab = vocab
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.byte_enc = _bytes_to_unicode()
        self.pad_id = vocab.get("<pad>", 1)
        self.unk_id = vocab.get("<unk>", 3)
        self.cls_id = vocab.get("<s>", 0)       # BOS plays the CLS role
        self.sep_id = vocab.get("</s>", 2)      # EOS plays the SEP role
        self._pat = regex.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
            r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def from_files(cls, vocab_path: str | Path,
                   merges_path: str | Path) -> "ByteLevelBpeTokenizer":
        import json

        vocab = json.loads(Path(vocab_path).read_text(encoding="utf-8"))
        merges: list[tuple[str, str]] = []
        with open(merges_path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, _, b = line.partition(" ")
                merges.append((a, b))
        return cls(vocab, merges)

    @property
    def vocab_size(self) -> int:
        return max(self.vocab.values()) + 1

    def _bpe(self, token: str) -> list[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        parts = list(token)
        while len(parts) > 1:
            best = None
            best_rank = None
            for pair in zip(parts[:-1], parts[1:]):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = pair, r
            if best is None:
                break
            merged = []
            i = 0
            while i < len(parts):
                if (i < len(parts) - 1
                        and (parts[i], parts[i + 1]) == best):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        if len(self._cache) < 65536:
            self._cache[token] = parts
        return parts

    def tokenize_ids(self, text: str) -> list[int]:
        ids: list[int] = []
        for pretok in self._pat.findall(text):
            mapped = "".join(self.byte_enc[b] for b in pretok.encode("utf-8"))
            for piece in self._bpe(mapped):
                ids.append(self.vocab.get(piece, self.unk_id))
        return ids

    def encode_batch(
        self, texts: list[str], max_len: int
    ) -> tuple[np.ndarray, np.ndarray]:
        return _frame_batch(self.tokenize_ids, self.cls_id, self.sep_id,
                            self.pad_id, texts, max_len)


class UnigramTokenizer:
    """SentencePiece-Unigram decoding from the HF fast-tokenizer JSON (the
    XLM-R / multilingual-e5 family). ``tokenizer.json`` carries the trained
    piece → log-probability table; segmentation is the published Viterbi
    max-likelihood decode (Kudo 2018) over Metaspace-pretokenized text.
    Replaces the sentencepiece C++ runtime (not installed in this image);
    reference parity target: any sentence-transformers multilingual model
    the reference loads via EMBEDDING_MODEL (reference config.py:33-36).

    Divergence: XLM-R's precompiled normalization charsmap is approximated
    by NFKC + whitespace collapse (the charsmap is NMT-normalize + NFKC;
    differences only on exotic codepoints).
    """

    def __init__(self, pieces: list[tuple[str, float]], unk_id: int,
                 specials: dict[str, int] | None = None):
        self.ids: dict[str, int] = {}
        self.logp: dict[str, float] = {}
        for i, (piece, lp) in enumerate(pieces):
            self.ids[piece] = i
            self.logp[piece] = float(lp)
        self.max_piece_len = max((len(p) for p, _ in pieces), default=1)
        self.unk_id = unk_id
        sp = specials or {}
        self.cls_id = sp.get("<s>", 0)          # BOS plays the CLS role
        self.pad_id = sp.get("<pad>", 1)
        self.sep_id = sp.get("</s>", 2)
        # Chars not covered by any piece cost just below the worst piece so
        # known pieces always win (sentencepiece's unk_penalty convention).
        self.unk_score = min(self.logp.values(), default=0.0) - 10.0
        self._specials = {p for p in ("<s>", "<pad>", "</s>", "<unk>",
                                      "<mask>") if p in self.ids}

    @classmethod
    def from_tokenizer_json(cls, path: str | Path) -> "UnigramTokenizer":
        import json

        data = json.loads(Path(path).read_text(encoding="utf-8"))
        model = data.get("model") or {}
        if model.get("type") != "Unigram":
            raise ValueError(f"not a Unigram tokenizer.json: {path}")
        specials = {t["content"]: t["id"]
                    for t in data.get("added_tokens", [])}
        return cls([(p, lp) for p, lp in model["vocab"]],
                   unk_id=int(model.get("unk_id", 0)), specials=specials)

    @property
    def vocab_size(self) -> int:
        return len(self.ids)

    def _viterbi(self, s: str) -> list[int]:
        """Max-total-log-prob segmentation of one pretoken."""
        n = len(s)
        # best[i]: (score up to i, start of the piece ending at i, id)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            hi = min(n, i + self.max_piece_len)
            for j in range(i + 1, hi + 1):
                piece = s[i:j]
                lp = self.logp.get(piece)
                if lp is None or piece in self._specials:
                    continue
                sc = best[i] + lp
                if sc > best[j]:
                    best[j] = sc
                    back[j] = (i, self.ids[piece])
            # single-char unk fallback keeps the lattice connected
            sc = best[i] + self.unk_score
            if sc > best[i + 1]:
                best[i + 1] = sc
                back[i + 1] = (i, self.unk_id)
        ids: list[int] = []
        j = n
        while j > 0:
            i, tid = back[j]  # type: ignore[misc]
            ids.append(tid)
            j = i
        ids.reverse()
        # sentencepiece fuses runs of unknown chars into ONE unk token
        out: list[int] = []
        for tid in ids:
            if tid == self.unk_id and out and out[-1] == self.unk_id:
                continue
            out.append(tid)
        return out

    def tokenize_ids(self, text: str) -> list[int]:
        import unicodedata

        text = unicodedata.normalize("NFKC", text)
        # charsmap approximation: control whitespace → space, then exact
        # Metaspace: prepend ▁, map each space to ▁, split before each ▁
        # (a double space yields a standalone ▁ piece, as in HF).
        for ws in "\t\n\r\f\v":
            text = text.replace(ws, " ")
        s = "▁" + text.replace(" ", "▁")
        ids: list[int] = []
        for seg in s.split("▁")[1:]:
            ids.extend(self._viterbi("▁" + seg))
        return ids

    def encode_batch(
        self, texts: list[str], max_len: int
    ) -> tuple[np.ndarray, np.ndarray]:
        return _frame_batch(self.tokenize_ids, self.cls_id, self.sep_id,
                            self.pad_id, texts, max_len)


def load_tokenizer(model_dir: str | Path | None, vocab_size: int = 30522):
    """Pick the tokenizer family from the checkpoint directory:
    SentencePiece-Unigram (``tokenizer.json`` with a Unigram model, XLM-R
    family), byte-level BPE (``vocab.json`` + ``merges.txt``, RoBERTa
    family), WordPiece (``vocab.txt``, BERT family), else the hashed-id
    fallback."""
    if model_dir:
        p = Path(model_dir)
        for base in (p, p / "0_Transformer"):
            tj = base / "tokenizer.json"
            if tj.exists():
                try:
                    return UnigramTokenizer.from_tokenizer_json(tj)
                except (ValueError, KeyError):
                    pass  # WordPiece/BPE tokenizer.json → file-based paths
        for base in (p, p / "0_Transformer"):
            vj, mt = base / "vocab.json", base / "merges.txt"
            if vj.exists() and mt.exists():
                try:
                    return ByteLevelBpeTokenizer.from_files(vj, mt)
                except ImportError:
                    import logging

                    logging.getLogger(__name__).warning(
                        "byte-level BPE needs the 'regex' package; "
                        "falling back to vocab.txt/hash tokenization")
                    break
        for cand in (p / "vocab.txt", p / "0_Transformer" / "vocab.txt"):
            if cand.exists():
                return WordPieceTokenizer.from_vocab_file(cand)
    return HashTokenizer(vocab_size=vocab_size)
