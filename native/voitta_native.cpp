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
// Porter stemmer (Porter 1980), matching sparse_text.porter_stem exactly.
// ---------------------------------------------------------------------------
bool is_vowel_char(char c) {
  return c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u';
}

bool is_cons(const std::string& w, int i) {
  char c = w[i];
  if (is_vowel_char(c)) return false;
  if (c == 'y') return i == 0 || !is_cons(w, i - 1);
  return true;
}

int measure(const std::string& s) {
  int m = 0, i = 0, n = (int)s.size();
  while (i < n && is_cons(s, i)) i++;
  while (i < n) {
    while (i < n && !is_cons(s, i)) i++;
    if (i >= n) break;
    m++;
    while (i < n && is_cons(s, i)) i++;
  }
  return m;
}

bool has_vowel(const std::string& s) {
  for (int i = 0; i < (int)s.size(); i++)
    if (!is_cons(s, i)) return true;
  return false;
}

bool ends_double_cons(const std::string& w) {
  int n = (int)w.size();
  return n >= 2 && w[n - 1] == w[n - 2] && is_cons(w, n - 1);
}

bool cvc(const std::string& w) {
  int n = (int)w.size();
  if (n < 3) return false;
  if (!(is_cons(w, n - 3) && !is_cons(w, n - 2) && is_cons(w, n - 1)))
    return false;
  char c = w[n - 1];
  return c != 'w' && c != 'x' && c != 'y';
}

bool ends_with(const std::string& w, const char* suf) {
  size_t sl = std::strlen(suf);
  return w.size() >= sl && w.compare(w.size() - sl, sl, suf) == 0;
}

std::string porter_stem(std::string w) {
  if (w.size() <= 2) return w;

  // Step 1a
  if (ends_with(w, "sses")) w.resize(w.size() - 2);
  else if (ends_with(w, "ies")) w.resize(w.size() - 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w.resize(w.size() - 1);

  // Step 1b
  bool flag = false;
  if (ends_with(w, "eed")) {
    if (measure(w.substr(0, w.size() - 3)) > 0) w.resize(w.size() - 1);
  } else if (ends_with(w, "ed")) {
    if (has_vowel(w.substr(0, w.size() - 2))) {
      w.resize(w.size() - 2);
      flag = true;
    }
  } else if (ends_with(w, "ing")) {
    if (has_vowel(w.substr(0, w.size() - 3))) {
      w.resize(w.size() - 3);
      flag = true;
    }
  }
  if (flag) {
    if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) {
      w += 'e';
    } else if (ends_double_cons(w) && w.back() != 'l' && w.back() != 's' &&
               w.back() != 'z') {
      w.resize(w.size() - 1);
    } else if (measure(w) == 1 && cvc(w)) {
      w += 'e';
    }
  }

  // Step 1c
  if (ends_with(w, "y") && has_vowel(w.substr(0, w.size() - 1))) {
    w.back() = 'i';
  }

  // Step 2
  {
    static const char* sufs[][2] = {
        {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
        {"anci", "ance"},   {"izer", "ize"},    {"abli", "able"},
        {"alli", "al"},     {"entli", "ent"},   {"eli", "e"},
        {"ousli", "ous"},   {"ization", "ize"}, {"ation", "ate"},
        {"ator", "ate"},    {"alism", "al"},    {"iveness", "ive"},
        {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
        {"iviti", "ive"},   {"biliti", "ble"}};
    for (auto& sr : sufs) {
      if (ends_with(w, sr[0])) {
        std::string stem = w.substr(0, w.size() - std::strlen(sr[0]));
        if (measure(stem) > 0) w = stem + sr[1];
        break;
      }
    }
  }

  // Step 3
  {
    static const char* sufs[][2] = {{"icate", "ic"}, {"ative", ""},
                                    {"alize", "al"}, {"iciti", "ic"},
                                    {"ical", "ic"},  {"ful", ""},
                                    {"ness", ""}};
    for (auto& sr : sufs) {
      if (ends_with(w, sr[0])) {
        std::string stem = w.substr(0, w.size() - std::strlen(sr[0]));
        if (measure(stem) > 0) w = stem + sr[1];
        break;
      }
    }
  }

  // Step 4
  {
    static const char* sufs[] = {"al",  "ance", "ence", "er",  "ic",  "able",
                                 "ible", "ant",  "ement", "ment", "ent", "ou",
                                 "ism",  "ate",  "iti",   "ous",  "ive", "ize"};
    bool matched = false;
    for (auto* suf : sufs) {
      if (ends_with(w, suf)) {
        std::string stem = w.substr(0, w.size() - std::strlen(suf));
        if (measure(stem) > 1) w = stem;
        matched = true;
        break;
      }
    }
    if (!matched && ends_with(w, "ion") && w.size() >= 4) {
      std::string stem = w.substr(0, w.size() - 3);
      char c = w[w.size() - 4];
      if (measure(stem) > 1 && (c == 's' || c == 't')) w = stem;
    }
  }

  // Step 5a
  if (ends_with(w, "e")) {
    std::string stem = w.substr(0, w.size() - 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !cvc(stem))) w = stem;
  }
  // Step 5b
  if (measure(w) > 1 && ends_double_cons(w) && w.back() == 'l')
    w.resize(w.size() - 1);
  return w;
}

// ---------------------------------------------------------------------------
// Stopwords (NLTK English list; apostrophe forms can't appear in [a-z0-9]+
// tokens but are kept for parity with the Python set)
// ---------------------------------------------------------------------------
const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string> s = {
      "a", "about", "above", "after", "again", "against", "all", "am", "an",
      "and", "any", "are", "aren't", "as", "at", "be", "because", "been",
      "before", "being", "below", "between", "both", "but", "by", "can't",
      "cannot", "could", "couldn't", "did", "didn't", "do", "does", "doesn't",
      "doing", "don't", "down", "during", "each", "few", "for", "from",
      "further", "had", "hadn't", "has", "hasn't", "have", "haven't",
      "having", "he", "he'd", "he'll", "he's", "her", "here", "here's",
      "hers", "herself", "him", "himself", "his", "how", "how's", "i", "i'd",
      "i'll", "i'm", "i've", "if", "in", "into", "is", "isn't", "it", "it's",
      "its", "itself", "let's", "me", "more", "most", "mustn't", "my",
      "myself", "no", "nor", "not", "of", "off", "on", "once", "only", "or",
      "other", "ought", "our", "ours", "ourselves", "out", "over", "own",
      "same", "shan't", "she", "she'd", "she'll", "she's", "should",
      "shouldn't", "so", "some", "such", "than", "that", "that's", "the",
      "their", "theirs", "them", "themselves", "then", "there", "there's",
      "these", "they", "they'd", "they'll", "they're", "they've", "this",
      "those", "through", "to", "too", "under", "until", "up", "very", "was",
      "wasn't", "we", "we'd", "we'll", "we're", "we've", "were", "weren't",
      "what", "what's", "when", "when's", "where", "where's", "which",
      "while", "who", "who's", "whom", "why", "why's", "with", "won't",
      "would", "wouldn't", "you", "you'd", "you'll", "you're", "you've",
      "your", "yours", "yourself", "yourselves"};
  return s;
}

}  // namespace

extern "C" {

uint32_t voitta_murmur3_32(const char* data, int len, uint32_t seed) {
  return murmur3_32(reinterpret_cast<const uint8_t*>(data), len, seed);
}

// Tokenize [a-z0-9]+ runs of lowercase(text), drop stopwords, Porter-stem,
// murmur3 & 0x7fffffff. Returns number of ids written (up to cap).
int voitta_term_ids(const char* text, int len, uint32_t* out, int cap) {
  int n_out = 0;
  std::string tok;
  for (int i = 0; i <= len; i++) {
    char c = (i < len) ? text[i] : ' ';
    if (c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
    if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
      tok += c;
      continue;
    }
    if (!tok.empty()) {
      if (!stopwords().count(tok)) {
        std::string stem = porter_stem(tok);
        if (n_out < cap) {
          out[n_out++] = murmur3_32(
              reinterpret_cast<const uint8_t*>(stem.data()),
              (int)stem.size(), 0) & 0x7fffffff;
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
