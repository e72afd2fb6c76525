// Native CLIP byte-pair-encoding tokenizer (ASCII fast path).
//
// Counterpart of the reference's SimpleTokenizer (AlignCLIP/align_clip/tokenizer.py:72-188)
// and the hot host-side stage of the input pipeline: tokenization of millions of captions
// per epoch. Bit-identical to the Python implementation (which is cross-validated against
// HuggingFace's CLIPTokenizer) for ASCII captions — the overwhelming majority of CC12M/LAION
// text. Strings containing non-ASCII bytes or HTML entities route back to the Python
// tokenizer from the bindings (Unicode NFC normalization needs ICU; not worth the
// dependency for the tail).
//
// Pipeline per caption: whitespace-collapse + lowercase -> CLIP's word regex (hand-compiled
// for ASCII: contractions 's 't 're 've 'm 'll 'd, letter runs, single digits, punctuation
// runs) -> byte-to-unicode table (ASCII printable maps to itself) -> iterative lowest-rank
// pair merges with a per-word cache -> ids, SOT/EOT framing, zero padding,
// truncate-keep-EOT.
//
// C ABI consumed via ctypes (multimodal_tpu/native/bindings.py).

#include <zlib.h>

#include <cctype>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kNumMerges = 49152 - 256 - 2;  // CLIP vocab construction (tokenizer.py:79)

struct Bpe {
  std::unordered_map<std::string, int> encoder;          // token string -> id
  std::unordered_map<std::string, int> merge_rank;       // "a b" -> rank
  std::unordered_map<std::string, std::vector<int>> cache;  // word -> ids
  std::mutex cache_mu;
  int sot = 0, eot = 0;
};

// byte -> unicode-char table, restricted to the ASCII printable range where the mapping is
// identity (bytes '!'..'~'); other bytes never reach the fast path.
bool ascii_identity(unsigned char b) { return b >= '!' && b <= '~'; }

std::string read_gz(const char* path) {
  gzFile f = gzopen(path, "rb");
  if (!f) return {};
  std::string out;
  char buf[1 << 16];
  int n;
  while ((n = gzread(f, buf, sizeof(buf))) > 0) out.append(buf, n);
  gzclose(f);
  return out;
}

Bpe* build(const char* vocab_path) {
  std::string data = read_gz(vocab_path);
  if (data.empty()) return nullptr;
  auto bpe = new Bpe();

  // vocab layout (tokenizer.py:76-84): 256 byte chars, 256 byte chars + "</w>",
  // then one token per merge line, then the two specials.
  // We only materialize entries reachable from ASCII input; ids preserve the full layout.
  // byte char ids: position of chr(b) in the byte-unicode table's value list = b for
  // printable ASCII (the table maps them first and in order).
  // Build the id map for the single-char tokens we can emit:
  // the byte-unicode value list is ordered by byte value over the printable ranges; ASCII
  // printable bytes occupy indices 0..93 ('!'..'~').
  for (unsigned char b = '!'; b <= '~'; ++b) {
    int idx = b - '!';
    std::string ch(1, static_cast<char>(b));
    bpe->encoder[ch] = idx;
    bpe->encoder[ch + "</w>"] = 256 + idx;
  }

  // merges: lines 1..kNumMerges of the vocab file
  size_t pos = data.find('\n');  // skip version header
  int rank = 0;
  while (pos != std::string::npos && rank < kNumMerges) {
    size_t end = data.find('\n', pos + 1);
    std::string line = data.substr(pos + 1, end - pos - 1);
    pos = end;
    if (line.empty()) break;
    bpe->merge_rank[line] = rank;
    // merged token id = 512 + rank (two char blocks of 256 each, then merges)
    std::string merged = line;
    merged.erase(merged.find(' '), 1);
    bpe->encoder[merged] = 512 + rank;
    ++rank;
  }
  bpe->sot = 512 + kNumMerges;      // <|startoftext|> = 49406
  bpe->eot = 512 + kNumMerges + 1;  // <|endoftext|>   = 49407
  bpe->encoder["<|startoftext|>"] = bpe->sot;
  bpe->encoder["<|endoftext|>"] = bpe->eot;
  // the special literals skip the merge loop entirely (tokenizer.py's _bpe_cache seed)
  bpe->cache["<|startoftext|>"] = {bpe->sot};
  bpe->cache["<|endoftext|>"] = {bpe->eot};
  return bpe;
}

// BPE merge loop over one regex word (tokenizer.py:98-137 semantics)
std::vector<int> bpe_word(Bpe* bpe, const std::string& word) {
  {
    std::lock_guard<std::mutex> lock(bpe->cache_mu);
    auto it = bpe->cache.find(word);
    if (it != bpe->cache.end()) return it->second;
  }
  std::vector<std::string> parts;
  for (size_t i = 0; i < word.size(); ++i) {
    std::string p(1, word[i]);
    if (i + 1 == word.size()) p += "</w>";
    parts.push_back(p);
  }
  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto it = bpe->merge_rank.find(parts[i] + " " + parts[i + 1]);
      if (it != bpe->merge_rank.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    // merge ALL occurrences of that pair left-to-right (tokenizer.py:117-131)
    const std::string a = parts[best_i], b = parts[best_i + 1];
    std::vector<std::string> merged;
    for (size_t i = 0; i < parts.size();) {
      if (i + 1 < parts.size() && parts[i] == a && parts[i + 1] == b) {
        merged.push_back(a + b);
        i += 2;
      } else {
        merged.push_back(parts[i]);
        i += 1;
      }
    }
    parts.swap(merged);
  }
  std::vector<int> ids;
  ids.reserve(parts.size());
  for (auto& p : parts) {
    auto it = bpe->encoder.find(p);
    if (it == bpe->encoder.end()) return {};  // unreachable for ASCII; signals fallback
    ids.push_back(it->second);
  }
  {
    std::lock_guard<std::mutex> lock(bpe->cache_mu);
    bpe->cache.emplace(word, ids);
  }
  return ids;
}

inline bool is_alpha(char c) { return std::isalpha(static_cast<unsigned char>(c)); }
inline bool is_digit(char c) { return std::isdigit(static_cast<unsigned char>(c)); }
inline bool is_space(char c) { return std::isspace(static_cast<unsigned char>(c)); }

// CLIP word regex over lowercase ASCII (tokenizer.py:93): contractions, letter runs,
// single digits, non-space-non-alnum runs. Emits words into `out`.
void split_words(const std::string& text, std::vector<std::string>* out) {
  size_t i = 0;
  const size_t n = text.size();
  static const std::string kSot = "<|startoftext|>", kEot = "<|endoftext|>";
  while (i < n) {
    if (is_space(text[i])) { ++i; continue; }
    // literal special tokens lead the regex alternation (tokenizer.py:93)
    if (text.compare(i, kSot.size(), kSot) == 0) {
      out->push_back(kSot);
      i += kSot.size();
      continue;
    }
    if (text.compare(i, kEot.size(), kEot) == 0) {
      out->push_back(kEot);
      i += kEot.size();
      continue;
    }
    // contractions: 's 't 're 've 'm 'll 'd
    if (text[i] == '\'' && i + 1 < n) {
      char c1 = text[i + 1];
      char c2 = i + 2 < n ? text[i + 2] : '\0';
      if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') {
        // only a contraction if NOT followed by more letters? The regex is alternation
        // without word boundaries: 's matches greedily wherever it appears.
        out->push_back(text.substr(i, 2));
        i += 2;
        continue;
      }
      if ((c1 == 'r' && c2 == 'e') || (c1 == 'v' && c2 == 'e') || (c1 == 'l' && c2 == 'l')) {
        out->push_back(text.substr(i, 3));
        i += 3;
        continue;
      }
    }
    if (is_alpha(text[i])) {
      size_t j = i;
      while (j < n && is_alpha(text[j])) ++j;
      out->push_back(text.substr(i, j - i));
      i = j;
      continue;
    }
    if (is_digit(text[i])) {
      out->push_back(text.substr(i, 1));  // [\p{N}] matches ONE digit
      ++i;
      continue;
    }
    // punctuation run: [^\s\p{L}\p{N}]+ — greedy, so apostrophes INSIDE a run are
    // consumed by it (the contraction alternatives only win when the scanner sits
    // exactly on the apostrophe, which is handled at the top of the loop)
    size_t j = i;
    while (j < n && !is_space(text[j]) && !is_alpha(text[j]) && !is_digit(text[j])) ++j;
    out->push_back(text.substr(i, j - i));
    i = j;
  }
}

}  // namespace

extern "C" {

void* mm_bpe_create(const char* vocab_gz_path) { return build(vocab_gz_path); }

void mm_bpe_destroy(void* handle) { delete static_cast<Bpe*>(handle); }

// Is this caption eligible for the native fast path? (pure ASCII, no HTML entities)
int mm_bpe_fast_eligible(const char* text, int64_t len) {
  for (int64_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c >= 0x80 || c == '&') return 0;
  }
  return 1;
}

// Tokenize a batch of '\0'-separated ASCII captions into out[n, context_length] int32 with
// SOT/EOT framing + zero padding + truncate-keep-EOT (tokenizer.py:159-188).
// Returns 0 on success, -1 if any caption needs the Python fallback (nothing written).
int mm_bpe_encode_batch(void* handle, const char* blob, const int64_t* offsets, int n,
                        int context_length, int32_t* out) {
  auto bpe = static_cast<Bpe*>(handle);
  for (int s = 0; s < n; ++s) {
    const char* start = blob + offsets[s];
    const int64_t len = offsets[s + 1] - offsets[s];
    if (!mm_bpe_fast_eligible(start, len)) return -1;

    // clean: lowercase + whitespace collapse (strip leading/trailing)
    std::string text;
    text.reserve(len);
    bool pending_space = false;
    for (int64_t i = 0; i < len; ++i) {
      char c = start[i];
      if (is_space(c)) {
        if (!text.empty()) pending_space = true;
        continue;
      }
      if (pending_space) {
        text += ' ';
        pending_space = false;
      }
      text += static_cast<char>(std::tolower(static_cast<unsigned char>(c)));
    }

    std::vector<std::string> words;
    split_words(text, &words);

    int32_t* row = out + static_cast<int64_t>(s) * context_length;
    std::memset(row, 0, sizeof(int32_t) * context_length);
    std::vector<int> ids;
    ids.push_back(bpe->sot);
    for (auto& w : words) {
      // verify fast-path byte coverage (printable ASCII only reaches the encoder)
      for (char c : w)
        if (!ascii_identity(static_cast<unsigned char>(c))) return -1;
      auto word_ids = bpe_word(bpe, w);
      if (word_ids.empty() && !w.empty()) return -1;
      ids.insert(ids.end(), word_ids.begin(), word_ids.end());
    }
    ids.push_back(bpe->eot);
    if (static_cast<int>(ids.size()) > context_length) {
      ids.resize(context_length);
      ids.back() = bpe->eot;
    }
    std::copy(ids.begin(), ids.end(), row);
  }
  return 0;
}

}  // extern "C"
