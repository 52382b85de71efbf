// voitta_native: C++ fast paths for host-side text processing.
//
// Replaces the hot host loop of the indexing pipeline — BM25 tokenization,
// English stopword filtering, Porter stemming, and MurmurHash3 term hashing —
// executed per token over millions of chunks at index time. Must stay
// behavior-identical to the Python reference implementation in
// voitta_rag_tpu/search/sparse_text.py (verified by tests/test_native.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// MurmurHash3 x86_32 (Austin Appleby, public domain)
// ---------------------------------------------------------------------------
uint32_t murmur3_32(const uint8_t* data, int len, uint32_t seed) {
  const uint32_t c1 = 0xcc9e2d51, c2 = 0x1b873593;
  uint32_t h = seed;
  const int nblocks = len / 4;
  for (int i = 0; i < nblocks; i++) {
    uint32_t k;
    std::memcpy(&k, data + i * 4, 4);
    k *= c1;
    k = (k << 15) | (k >> 17);
    k *= c2;
    h ^= k;
    h = (h << 13) | (h >> 19);
    h = h * 5 + 0xe6546b64;
  }
  const uint8_t* tail = data + nblocks * 4;
  uint32_t k = 0;
  switch (len & 3) {
    case 3: k ^= tail[2] << 16; [[fallthrough]];
    case 2: k ^= tail[1] << 8; [[fallthrough]];
    case 1:
      k ^= tail[0];
      k *= c1;
      k = (k << 15) | (k >> 17);
      k *= c2;
      h ^= k;
  }
  h ^= (uint32_t)len;
  h ^= h >> 16;
  h *= 0x85ebca6b;
  h ^= h >> 13;
  h *= 0xc2b2ae35;
  h ^= h >> 16;
  return h;
}

// ---------------------------------------------------------------------------
// Snowball "english" stemmer (Porter2), matching
// sparse_text.snowball_stem exactly — the algorithm fastembed's Bm25 runs.
// Consonant-y is marked 'Y' (word-initial or after a vowel); R1/R2 are
// fixed integer positions computed once (official Snowball semantics).
// ---------------------------------------------------------------------------
bool sb_vowel(char c) {
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y';
}

bool ends_with(const std::string& w, const char* suf) {
  size_t sl = std::strlen(suf);
  return w.size() >= sl && w.compare(w.size() - sl, sl, suf) == 0;
}

int sb_r1(const std::string& w) {
  static const char* pres[] = {"gener", "commun", "arsen"};
  for (auto* pre : pres) {
    size_t pl = std::strlen(pre);
    if (w.size() >= pl && w.compare(0, pl, pre) == 0) return (int)pl;
  }
  for (int i = 1; i < (int)w.size(); i++)
    if (!sb_vowel(w[i]) && sb_vowel(w[i - 1])) return i + 1;
  return (int)w.size();
}

int sb_region(const std::string& w, int start) {
  for (int i = start + 1; i < (int)w.size(); i++)
    if (!sb_vowel(w[i]) && sb_vowel(w[i - 1])) return i + 1;
  return (int)w.size();
}

bool sb_ends_short_syllable(const std::string& w) {
  int n = (int)w.size();
  if (n == 2) return sb_vowel(w[0]) && !sb_vowel(w[1]);
  if (n >= 3)
    return !sb_vowel(w[n - 3]) && sb_vowel(w[n - 2]) && !sb_vowel(w[n - 1]) &&
           w[n - 1] != 'w' && w[n - 1] != 'x' && w[n - 1] != 'Y';
  return false;
}

bool sb_has_vowel(const std::string& w, int upto) {
  for (int i = 0; i < upto && i < (int)w.size(); i++)
    if (sb_vowel(w[i])) return true;
  return false;
}

std::string snowball_stem(std::string w) {
  if (w.size() <= 2) return w;
  static const std::unordered_map<std::string, std::string> exceptions = {
      {"skis", "ski"},     {"skies", "sky"},   {"dying", "die"},
      {"lying", "lie"},    {"tying", "tie"},   {"idly", "idl"},
      {"gently", "gentl"}, {"ugly", "ugli"},   {"early", "earli"},
      {"only", "onli"},    {"singly", "singl"}, {"sky", "sky"},
      {"news", "news"},    {"howe", "howe"},   {"atlas", "atlas"},
      {"cosmos", "cosmos"}, {"bias", "bias"},  {"andes", "andes"}};
  auto ex = exceptions.find(w);
  if (ex != exceptions.end()) return ex->second;
  if (w[0] == '\'') w.erase(0, 1);
  // mark consonant-y
  if (w[0] == 'y') w[0] = 'Y';
  for (int i = 1; i < (int)w.size(); i++)
    if (w[i] == 'y' && sb_vowel(w[i - 1])) w[i] = 'Y';
  const int r1 = sb_r1(w);
  const int r2 = sb_region(w, r1);

  // Step 0
  for (auto* suf : {"'s'", "'s", "'"}) {
    if (ends_with(w, suf)) {
      w.resize(w.size() - std::strlen(suf));
      break;
    }
  }

  // Step 1a
  if (ends_with(w, "sses")) {
    w.resize(w.size() - 2);
  } else if (ends_with(w, "ied") || ends_with(w, "ies")) {
    w.resize(w.size() - (w.size() > 4 ? 2 : 1));
  } else if (ends_with(w, "us") || ends_with(w, "ss")) {
  } else if (ends_with(w, "s")) {
    if (sb_has_vowel(w, (int)w.size() - 2)) w.resize(w.size() - 1);
  }

  static const std::unordered_set<std::string> stop1a = {
      "inning", "outing", "canning", "herring", "earring",
      "proceed", "exceed", "succeed"};
  if (stop1a.count(w)) {
    std::replace(w.begin(), w.end(), 'Y', 'y');
    return w;
  }

  // Step 1b
  if (ends_with(w, "eedly") || ends_with(w, "eed")) {
    int sl = ends_with(w, "eedly") ? 5 : 3;
    if ((int)w.size() - sl >= r1) {
      w.resize(w.size() - sl);
      w += "ee";
    }
  } else {
    for (auto* suf : {"ingly", "edly", "ing", "ed"}) {
      if (ends_with(w, suf)) {
        int sl = (int)std::strlen(suf);
        if (sb_has_vowel(w, (int)w.size() - sl)) {
          w.resize(w.size() - sl);
          if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
            w += 'e';
          } else if (ends_with(w, "bb") || ends_with(w, "dd") ||
                     ends_with(w, "ff") || ends_with(w, "gg") ||
                     ends_with(w, "mm") || ends_with(w, "nn") ||
                     ends_with(w, "pp") || ends_with(w, "rr") ||
                     ends_with(w, "tt")) {
            w.resize(w.size() - 1);
          } else if (r1 >= (int)w.size() && sb_ends_short_syllable(w)) {
            w += 'e';
          }
        }
        break;
      }
    }
  }

  // Step 1c
  if (w.size() > 2 && (w.back() == 'y' || w.back() == 'Y') &&
      !sb_vowel(w[w.size() - 2]))
    w.back() = 'i';

  // Step 2 (longest match, then R1)
  {
    static const char* sufs[][2] = {
        {"ization", "ize"}, {"ational", "ate"}, {"fulness", "ful"},
        {"ousness", "ous"}, {"iveness", "ive"}, {"tional", "tion"},
        {"biliti", "ble"},  {"lessli", "less"}, {"entli", "ent"},
        {"ation", "ate"},   {"alism", "al"},    {"aliti", "al"},
        {"ousli", "ous"},   {"iviti", "ive"},   {"fulli", "ful"},
        {"enci", "ence"},   {"anci", "ance"},   {"abli", "able"},
        {"izer", "ize"},    {"ator", "ate"},    {"alli", "al"},
        {"bli", "ble"},     {"ogi", "og"},      {"li", ""}};
    for (auto& sr : sufs) {
      if (ends_with(w, sr[0])) {
        int sl = (int)std::strlen(sr[0]);
        if ((int)w.size() - sl >= r1) {
          if (std::strcmp(sr[0], "ogi") == 0) {
            if (w.size() > 3 && w[w.size() - 4] == 'l') {
              w.resize(w.size() - 3);
              w += "og";
            }
          } else if (std::strcmp(sr[0], "li") == 0) {
            if (w.size() > 2) {
              char c = w[w.size() - 3];
              if (std::strchr("cdeghkmnrt", c)) w.resize(w.size() - 2);
            }
          } else {
            w.resize(w.size() - sl);
            w += sr[1];
          }
        }
        break;
      }
    }
  }

  // Step 3 (longest match, then R1; ative needs R2)
  {
    static const char* sufs[][2] = {
        {"ational", "ate"}, {"tional", "tion"}, {"alize", "al"},
        {"icate", "ic"},    {"iciti", "ic"},    {"ative", ""},
        {"ical", "ic"},     {"ness", ""},       {"ful", ""}};
    for (auto& sr : sufs) {
      if (ends_with(w, sr[0])) {
        int sl = (int)std::strlen(sr[0]);
        if ((int)w.size() - sl >= r1) {
          if (std::strcmp(sr[0], "ative") == 0) {
            if ((int)w.size() - sl >= r2) w.resize(w.size() - sl);
          } else {
            w.resize(w.size() - sl);
            w += sr[1];
          }
        }
        break;
      }
    }
  }

  // Step 4 (longest match, then R2; ion needs s/t before it)
  {
    static const char* sufs[] = {"ement", "ance", "ence", "able", "ible",
                                 "ment",  "ant",  "ent",  "ism",  "ate",
                                 "iti",   "ous",  "ive",  "ize",  "ion",
                                 "al",    "er",   "ic"};
    for (auto* suf : sufs) {
      if (ends_with(w, suf)) {
        int sl = (int)std::strlen(suf);
        if ((int)w.size() - sl >= r2) {
          if (std::strcmp(suf, "ion") == 0) {
            if (w.size() > 3 &&
                (w[w.size() - 4] == 's' || w[w.size() - 4] == 't'))
              w.resize(w.size() - 3);
          } else {
            w.resize(w.size() - sl);
          }
        }
        break;
      }
    }
  }

  // Step 5
  if (!w.empty() && w.back() == 'e') {
    std::string stem = w.substr(0, w.size() - 1);
    if ((int)stem.size() >= r2 ||
        ((int)stem.size() >= r1 && !sb_ends_short_syllable(stem)))
      w = stem;
  } else if (w.size() >= 2 && w.back() == 'l' && (int)w.size() - 1 >= r2 &&
             w[w.size() - 2] == 'l') {
    w.resize(w.size() - 1);
  }

  std::replace(w.begin(), w.end(), 'Y', 'y');
  return w;
}

// ---------------------------------------------------------------------------
// Stopwords: NLTK English list, modern 179-entry revision (what the
// Qdrant/bm25 model ships as stopwords.txt). Must equal
// sparse_text.STOPWORDS. Apostrophe forms can't appear in \w+ tokens but
// are kept for list fidelity; the bare stems (don, t, s, ll, ve, …) do
// the real contraction filtering.
// ---------------------------------------------------------------------------
const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string> s = {
      "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
      "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
      "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
      "hers", "herself", "it", "it's", "its", "itself", "they", "them",
      "their", "theirs", "themselves", "what", "which", "who", "whom",
      "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
      "were", "be", "been", "being", "have", "has", "had", "having", "do",
      "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
      "because", "as", "until", "while", "of", "at", "by", "for", "with",
      "about", "against", "between", "into", "through", "during", "before",
      "after", "above", "below", "to", "from", "up", "down", "in", "out",
      "on", "off", "over", "under", "again", "further", "then", "once",
      "here", "there", "when", "where", "why", "how", "all", "any", "both",
      "each", "few", "more", "most", "other", "some", "such", "no", "nor",
      "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
      "can", "will", "just", "don", "don't", "should", "should've", "now",
      "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
      "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
      "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
      "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
      "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren",
      "weren't", "won", "won't", "wouldn", "wouldn't"};
  return s;
}

}  // namespace

extern "C" {

uint32_t voitta_murmur3_32(const char* data, int len, uint32_t seed) {
  return murmur3_32(reinterpret_cast<const uint8_t*>(data), len, seed);
}

// fastembed-compatible term ids for ASCII text (the Python wrapper routes
// any text with non-ASCII bytes to the reference implementation, since
// Python's \w is Unicode-aware). Tokens are [a-z0-9_]+ runs of
// lowercase(text); filters: single punctuation char ("_"), stopword,
// length > 40; then Snowball-stem and abs(signed mmh3).
// Returns number of ids written (up to cap).
int voitta_term_ids(const char* text, int len, uint32_t* out, int cap) {
  int n_out = 0;
  std::string tok;
  for (int i = 0; i <= len; i++) {
    char c = (i < len) ? text[i] : ' ';
    if (c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
    if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_') {
      tok += c;
      continue;
    }
    if (!tok.empty()) {
      if (tok != "_" && tok.size() <= 40 && !stopwords().count(tok)) {
        std::string stem = snowball_stem(tok);
        if (n_out < cap) {
          uint32_t h = murmur3_32(
              reinterpret_cast<const uint8_t*>(stem.data()),
              (int)stem.size(), 0);
          // abs() of the signed reading; -2^31 clamps to 2^31-1
          uint32_t id = h == 0x80000000u ? 0x7fffffffu
                        : (h & 0x80000000u) ? (uint32_t)(-(int64_t)(int32_t)h)
                                            : h;
          out[n_out++] = id;
        }
      }
      tok.clear();
    }
  }
  return n_out;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// WordPiece fast path (ASCII-only inputs; the Python tokenizer handles the
// unicode tail). Mirrors models/tokenizer.py exactly for ASCII text:
// basic_tokenize = drop control chars, split on whitespace + ASCII
// punctuation, lowercase; then greedy longest-match-first WordPiece.
// ---------------------------------------------------------------------------

namespace {

std::unordered_map<std::string, int>& wp_vocab() {
  static std::unordered_map<std::string, int> v;
  return v;
}

inline bool wp_is_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

inline bool wp_is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

// Greedy longest-match; returns false on unmatchable word (caller emits UNK).
bool wp_word(const std::string& word, int unk_id, int max_word_chars,
             std::vector<int>& out) {
  if ((int)word.size() > max_word_chars) {
    out.push_back(unk_id);
    return true;
  }
  auto& vocab = wp_vocab();
  size_t start = 0, n = word.size();
  size_t first = out.size();
  while (start < n) {
    size_t end = n;
    int cur = -1;
    while (start < end) {
      std::string piece = (start > 0 ? "##" : "") +
                          word.substr(start, end - start);
      auto it = vocab.find(piece);
      if (it != vocab.end()) {
        cur = it->second;
        break;
      }
      end--;
    }
    if (cur < 0) {
      out.resize(first);
      out.push_back(unk_id);
      return true;
    }
    out.push_back(cur);
    start = end;
  }
  return true;
}

}  // namespace

extern "C" {

// Load the vocab: newline-separated tokens, id = line number. Returns count.
int voitta_wp_load(const char* buf, long len) {
  auto& vocab = wp_vocab();
  vocab.clear();
  int id = 0;
  long start = 0;
  for (long i = 0; i <= len; i++) {
    if (i == len || buf[i] == '\n') {
      vocab.emplace(std::string(buf + start, i - start), id++);
      start = i + 1;
    }
  }
  return (int)vocab.size();
}

// Tokenize ASCII text to WordPiece ids. Returns n ids written (<= cap), or
// -1 if a non-ASCII byte is present (caller must use the Python path).
int voitta_wp_encode(const char* text, int len, int unk_id,
                     int max_word_chars, int32_t* out, int cap) {
  std::vector<int> ids;
  ids.reserve(len / 4 + 8);
  std::string word;
  for (int i = 0; i <= len; i++) {
    unsigned char c = (i < len) ? (unsigned char)text[i] : ' ';
    if (c >= 0x80) return -1;  // non-ASCII: Python handles unicode rules
    if (i < len && !wp_is_space(c) && !wp_is_punct(c) && c > 0x20 &&
        c != 0x7f) {
      word += (char)(c >= 'A' && c <= 'Z' ? c - 'A' + 'a' : c);
      continue;
    }
    if (!word.empty()) {
      wp_word(word, unk_id, max_word_chars, ids);
      word.clear();
    }
    if (i < len && wp_is_punct(c)) {
      std::string p(1, (char)c);
      wp_word(p, unk_id, max_word_chars, ids);
    }
  }
  int n = (int)std::min((size_t)cap, ids.size());
  for (int i = 0; i < n; i++) out[i] = ids[i];
  return n;
}

}  // extern "C"
