// Native host runtime for complexity_tokenizer_tpu.
//
// The reference's hot host paths are Rust (bpe.rs merge loop,
// pretokenizers.rs regex scan).  This C++ library is the equivalent native
// tier for the *host* side of the TPU framework: it implements the same
// GPT-2 simplified pre-split (local boundary rules over UTF-8 bytes,
// identical to ops/presplit.py), byte->token seeding with silent OOV drop
// (bpe.rs:94-97), and the leftmost-lowest-rank merge loop (bpe.rs:104-153),
// plus batch packing into padded byte matrices for device dispatch.
//
// Exposed via a C ABI for ctypes; semantics are diff-tested against the
// Python oracle in tests/test_native.py.

#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct PairKey {
    uint64_t v;
    bool operator==(const PairKey& o) const { return v == o.v; }
};

struct PairKeyHash {
    size_t operator()(const PairKey& k) const {
        uint64_t h = k.v * 0x9E3779B97F4A7C15ull;
        h ^= h >> 29;
        return (size_t)h;
    }
};

// Per-thread word -> token-ids memo (the reference recomputes BPE for every
// occurrence of every word; natural text is Zipf-distributed, so a word
// cache removes the vast majority of merge-loop work).
struct WordCache {
    struct Entry {
        uint64_t hash;
        uint64_t key_off;
        uint32_t key_len;
        uint32_t ids_off;
        uint32_t ids_len;
    };
    // open-addressing slots: 0 = empty, else entry_index + 1
    std::vector<uint32_t> slots;
    uint64_t mask = 0;
    std::vector<uint8_t> key_arena;
    std::vector<int32_t> ids_arena;
    std::vector<Entry> entries;

    void grow() {
        size_t cap = slots.empty() ? 4096 : slots.size() * 2;
        std::vector<uint32_t> ns(cap, 0);
        uint64_t m = cap - 1;
        for (uint32_t ei = 0; ei < entries.size(); ++ei) {
            uint64_t h = entries[ei].hash & m;
            while (ns[h]) h = (h + 1) & m;
            ns[h] = ei + 1;
        }
        slots.swap(ns);
        mask = m;
    }

    // returns entry index or -1
    int64_t find(uint64_t hash, const uint8_t* key, int64_t len) const {
        if (slots.empty()) return -1;
        uint64_t h = hash & mask;
        while (uint32_t s = slots[h]) {
            const Entry& e = entries[s - 1];
            if (e.hash == hash && e.key_len == (uint32_t)len &&
                std::memcmp(key_arena.data() + e.key_off, key, len) == 0)
                return s - 1;
            h = (h + 1) & mask;
        }
        return -1;
    }

    void insert(uint64_t hash, const uint8_t* key, int64_t len,
                const int32_t* ids, int64_t n_ids) {
        if (entries.size() * 2 + 2 >= slots.size()) grow();
        Entry e;
        e.hash = hash;
        e.key_off = key_arena.size();
        e.key_len = (uint32_t)len;
        e.ids_off = (uint32_t)ids_arena.size();
        e.ids_len = (uint32_t)n_ids;
        key_arena.insert(key_arena.end(), key, key + len);
        ids_arena.insert(ids_arena.end(), ids, ids + n_ids);
        uint64_t h = hash & mask;
        while (slots[h]) h = (h + 1) & mask;
        slots[h] = (uint32_t)entries.size() + 1;
        entries.push_back(e);
    }
};

constexpr int kMaxThreads = 16;
constexpr int64_t kMaxCachedWord = 256;

struct Ctx {
    std::unordered_map<PairKey, int32_t, PairKeyHash> ranks;
    std::vector<int32_t> rank_new;  // rank -> minted id (-1 gaps)
    int32_t byte_token[256];
    // GPT-2 classes per codepoint: 0=other,1=ws,2=letter,3=number
    const uint8_t* cls_table;  // borrowed; caller keeps alive
    int64_t cls_size;
    uint8_t ascii_cls[128];  // fast path for ASCII bytes
    WordCache caches[kMaxThreads];
};

inline uint64_t fnv1a(const uint8_t* p, int64_t n) {
    uint64_t h = 1469598103934665603ull;
    for (int64_t i = 0; i < n; ++i) {
        h ^= p[i];
        h *= 1099511628211ull;
    }
    return h;
}

inline PairKey key(int32_t a, int32_t b) {
    return PairKey{(uint64_t)(uint32_t)a << 32 | (uint32_t)b};
}

inline int cls_of(const Ctx* c, uint32_t cp) {
    if ((int64_t)cp >= c->cls_size) return 0;
    return c->cls_table[cp];
}

constexpr int CL_OTHER = 0, CL_WS = 1, CL_LETTER = 2, CL_NUMBER = 3, CL_NONE = 4;

// Decode the codepoint whose lead byte is at data[i]; returns byte length.
inline int decode_cp(const uint8_t* data, int64_t n, int64_t i, uint32_t* cp) {
    uint8_t b0 = data[i];
    if (b0 < 0x80) { *cp = b0; return 1; }
    if (b0 < 0xE0) {
        *cp = ((uint32_t)(b0 & 0x1F) << 6) | (i + 1 < n ? data[i + 1] & 0x3F : 0);
        return 2;
    }
    if (b0 < 0xF0) {
        *cp = ((uint32_t)(b0 & 0x0F) << 12) |
              ((i + 1 < n ? (uint32_t)(data[i + 1] & 0x3F) : 0u) << 6) |
              (i + 2 < n ? data[i + 2] & 0x3F : 0);
        return 3;
    }
    *cp = ((uint32_t)(b0 & 0x07) << 18) |
          ((i + 1 < n ? (uint32_t)(data[i + 1] & 0x3F) : 0u) << 12) |
          ((i + 2 < n ? (uint32_t)(data[i + 2] & 0x3F) : 0u) << 6) |
          (i + 3 < n ? data[i + 3] & 0x3F : 0);
    return 4;
}

// Greedy lowest-rank merge loop on one word's token vector (bpe.rs:104-153).
inline void merge_word(const Ctx* c, std::vector<int32_t>& toks) {
    while (toks.size() > 1) {
        int best_i = -1;
        int32_t best_rank = 0;
        for (size_t i = 0; i + 1 < toks.size(); ++i) {
            auto it = c->ranks.find(key(toks[i], toks[i + 1]));
            if (it == c->ranks.end()) continue;
            if (best_i < 0 || it->second < best_rank) {
                best_i = (int)i;
                best_rank = it->second;
            }
        }
        if (best_i < 0) break;
        toks[best_i] = c->rank_new[best_rank];
        toks.erase(toks.begin() + best_i + 1);
    }
}

// class of char at data[i]; sets *clen to its UTF-8 length
inline int cls_at(const Ctx* c, const uint8_t* data, int64_t n, int64_t i,
                  int* clen) {
    uint8_t b = data[i];
    if (b < 0x80) {
        *clen = 1;
        return c->ascii_cls[b];
    }
    uint32_t cp;
    *clen = decode_cp(data, n, i, &cp);
    return cls_of(c, cp);
}

// Encode one word's bytes into out; returns count.  Uses the cache when
// provided and the word is small enough.
inline int64_t encode_word(const Ctx* c, WordCache* cache, const uint8_t* data,
                           int64_t start, int64_t end, int32_t* out,
                           std::vector<int32_t>& scratch) {
    int64_t wlen = end - start;
    uint64_t h = 0;
    if (cache && wlen <= kMaxCachedWord) {
        h = fnv1a(data + start, wlen);
        int64_t ei = cache->find(h, data + start, wlen);
        if (ei >= 0) {
            const WordCache::Entry& e = cache->entries[ei];
            std::memcpy(out, cache->ids_arena.data() + e.ids_off,
                        e.ids_len * sizeof(int32_t));
            return e.ids_len;
        }
    }
    scratch.clear();
    for (int64_t k = start; k < end; ++k) {
        int32_t t = c->byte_token[data[k]];
        if (t >= 0) scratch.push_back(t);
    }
    if (!scratch.empty()) merge_word(c, scratch);
    for (size_t i = 0; i < scratch.size(); ++i) out[i] = scratch[i];
    if (cache && wlen <= kMaxCachedWord) {
        cache->insert(h, data + start, wlen, scratch.data(),
                      (int64_t)scratch.size());
    }
    return (int64_t)scratch.size();
}

// Scan [data, data+n) emitting GPT-2 simplified matches; for each word call
// encode_word.  Returns total ids written.
inline int64_t encode_text(const Ctx* c, WordCache* cache, const uint8_t* data,
                           int64_t n, int32_t* out,
                           std::vector<int32_t>& scratch) {
    if (n <= 0) return 0;
    int64_t n_out = 0;
    int64_t i = 0;
    while (i < n) {
        int clen;
        int cur_cls = cls_at(c, data, n, i, &clen);
        int64_t start = i, end;
        int contr = 0;
        if (data[i] == '\'' && i + 1 < n) {
            uint8_t n1 = data[i + 1];
            if (n1 == 's' || n1 == 't' || n1 == 'm' || n1 == 'd') contr = 2;
            else if (i + 2 < n) {
                uint8_t n2 = data[i + 2];
                if ((n1 == 'r' && n2 == 'e') || (n1 == 'v' && n2 == 'e') ||
                    (n1 == 'l' && n2 == 'l'))
                    contr = 3;
            }
        }
        if (contr) {
            end = i + contr;
        } else {
            int64_t j = i;
            int run_cls = cur_cls;
            if (data[i] == ' ' && i + 1 < n) {
                int l2;
                int c2 = cls_at(c, data, n, i + 1, &l2);
                if (c2 != CL_WS) {
                    j = i + 1;
                    run_cls = c2;
                }
            }
            if (run_cls == CL_WS) end = i;
            else end = j;
            while (end < n) {
                int lr;
                if (cls_at(c, data, n, end, &lr) != run_cls) break;
                end += lr;
            }
        }
        n_out += encode_word(c, cache, data, start, end, out + n_out, scratch);
        i = end;
    }
    return n_out;
}

}  // namespace

extern "C" {

void* ctok_new(int64_t n_pairs, const int32_t* pa, const int32_t* pb,
               const int32_t* pr, const int32_t* rank_new, int64_t n_ranks,
               const int32_t* byte_token, const uint8_t* cls_table,
               int64_t cls_size) {
    Ctx* c = new Ctx();
    c->ranks.reserve((size_t)n_pairs * 2);
    for (int64_t i = 0; i < n_pairs; ++i)
        c->ranks.emplace(key(pa[i], pb[i]), pr[i]);
    c->rank_new.assign(rank_new, rank_new + n_ranks);
    std::memcpy(c->byte_token, byte_token, 256 * sizeof(int32_t));
    c->cls_table = cls_table;
    c->cls_size = cls_size;
    for (int i = 0; i < 128 && i < cls_size; ++i) c->ascii_cls[i] = cls_table[i];
    return c;
}

void ctok_free(void* p) { delete (Ctx*)p; }

// Full host encode of one UTF-8 text (already normalized, prefix-space
// already applied).  Writes ids into out (capacity n, one id per input byte
// is an upper bound).  Returns the id count.
int64_t ctok_encode(void* p, const uint8_t* data, int64_t n, int32_t* out) {
    Ctx* c = (Ctx*)p;
    std::vector<int32_t> scratch;
    scratch.reserve(64);
    return encode_text(c, &c->caches[0], data, n, out, scratch);
}

// Batch encode with per-thread word caches.  ``joined`` holds all texts
// back to back; ``offsets[i]..offsets[i+1]`` delimits text i.  Ids for text
// i are written at out + offsets[i] (a text's id count never exceeds its
// byte count); counts go to out_counts.  Caches persist across calls.
void ctok_encode_batch(void* p, const uint8_t* joined, const int64_t* offsets,
                       int64_t n_texts, int32_t* out, int32_t* out_counts,
                       int32_t n_threads) {
    Ctx* c = (Ctx*)p;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > kMaxThreads) n_threads = kMaxThreads;
    if (n_texts < n_threads * 4) n_threads = 1;

    auto worker = [&](int tid) {
        std::vector<int32_t> scratch;
        scratch.reserve(64);
        WordCache* cache = &c->caches[tid];
        // balanced partition by byte volume
        int64_t total = offsets[n_texts];
        int64_t lo_b = total * tid / n_threads;
        int64_t hi_b = total * (tid + 1) / n_threads;
        for (int64_t i = 0; i < n_texts; ++i) {
            int64_t a = offsets[i];
            if (a < lo_b || a >= hi_b) continue;
            int64_t b = offsets[i + 1];
            out_counts[i] = (int32_t)encode_text(
                c, cache, joined + a, b - a, out + a, scratch);
        }
    };
    if (n_threads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> threads;
        for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
        for (auto& th : threads) th.join();
    }
}

// Compact per-text id regions (written at byte offsets by
// ctok_encode_batch) into one contiguous buffer + result offsets.
void ctok_compact(const int32_t* src, const int64_t* offsets,
                  const int32_t* counts, int64_t n_texts, int32_t* dst,
                  int64_t* dst_offsets) {
    int64_t pos = 0;
    for (int64_t i = 0; i < n_texts; ++i) {
        dst_offsets[i] = pos;
        int64_t cnt = counts[i];
        std::memcpy(dst + pos, src + offsets[i], cnt * sizeof(int32_t));
        pos += cnt;
    }
    dst_offsets[n_texts] = pos;
}

// Multi-pattern gate: grouped by first byte so the common no-match case is
// one memchr sweep per distinct lead byte (SIMD, ~memory speed).  Used as
// the added-token routing gate (a byte-level superset of the
// orchestrator's added-token match, huggingface/mod.rs:616-692 — false
// positives only cost a host-path encode, never a wrong result).
struct PatternSet {
    const uint8_t* buf;
    const int64_t* offs;
    // patterns grouped by first byte
    std::vector<int32_t> by_first[256];
    PatternSet(const uint8_t* pat_buf, const int64_t* pat_offsets,
               int64_t n_pats)
        : buf(pat_buf), offs(pat_offsets) {
        for (int64_t p = 0; p < n_pats; ++p)
            if (pat_offsets[p + 1] > pat_offsets[p])
                by_first[pat_buf[pat_offsets[p]]].push_back((int32_t)p);
    }
    bool matches(const uint8_t* text, int64_t len) const {
        for (int f = 0; f < 256; ++f) {
            const auto& pats = by_first[f];
            if (pats.empty()) continue;
            const uint8_t* p = text;
            const uint8_t* end = text + len;
            while ((p = (const uint8_t*)memchr(p, f, end - p))) {
                int64_t rem = end - p;
                for (int32_t pi : pats) {
                    int64_t pl = offs[pi + 1] - offs[pi];
                    if (pl <= rem && memcmp(p, buf + offs[pi], pl) == 0)
                        return true;
                }
                ++p;
            }
        }
        return false;
    }
};

void ctok_match_any(const uint8_t* joined, const int64_t* offsets,
                    int64_t n_texts, const uint8_t* pat_buf,
                    const int64_t* pat_offsets, int64_t n_pats,
                    uint8_t* out_flags, int32_t n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > kMaxThreads) n_threads = kMaxThreads;
    if (n_texts < n_threads * 4) n_threads = 1;
    PatternSet ps(pat_buf, pat_offsets, n_pats);
    auto worker = [&](int tid) {
        int64_t total = offsets[n_texts];
        int64_t lo_b = total * tid / n_threads;
        int64_t hi_b = total * (tid + 1) / n_threads;
        for (int64_t i = 0; i < n_texts; ++i) {
            int64_t a = offsets[i];
            if (a < lo_b || a >= hi_b) continue;
            out_flags[i] = ps.matches(joined + a, offsets[i + 1] - a) ? 1 : 0;
        }
    };
    if (n_threads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> threads;
        for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
        for (auto& th : threads) th.join();
    }
}

// Fused gate + encode: texts where an added-token pattern occurs get
// out_counts[i] = -1 (caller routes them to the exact host matcher); all
// others are encoded as in ctok_encode_batch.  One pass, one thread pool.
void ctok_encode_batch_gated(void* p, const uint8_t* joined,
                             const int64_t* offsets, int64_t n_texts,
                             const uint8_t* pat_buf,
                             const int64_t* pat_offsets, int64_t n_pats,
                             int32_t* out, int32_t* out_counts,
                             int32_t n_threads) {
    Ctx* c = (Ctx*)p;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > kMaxThreads) n_threads = kMaxThreads;
    if (n_texts < n_threads * 4) n_threads = 1;
    PatternSet ps(pat_buf, pat_offsets, n_pats);
    auto worker = [&](int tid) {
        std::vector<int32_t> scratch;
        scratch.reserve(64);
        WordCache* cache = &c->caches[tid];
        int64_t total = offsets[n_texts];
        int64_t lo_b = total * tid / n_threads;
        int64_t hi_b = total * (tid + 1) / n_threads;
        for (int64_t i = 0; i < n_texts; ++i) {
            int64_t a = offsets[i];
            if (a < lo_b || a >= hi_b) continue;
            int64_t len = offsets[i + 1] - a;
            if (n_pats && ps.matches(joined + a, len)) {
                out_counts[i] = -1;
                continue;
            }
            out_counts[i] = (int32_t)encode_text(
                c, cache, joined + a, len, out + a, scratch);
        }
    };
    if (n_threads == 1) {
        worker(0);
    } else {
        std::vector<std::thread> threads;
        for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker, t);
        for (auto& th : threads) th.join();
    }
}

// Batch pack: joined byte buffer + offsets -> zero-padded [B, L] matrix.
void ctok_pack(const uint8_t* joined, const int64_t* offsets, int64_t B,
               int64_t L, uint8_t* out, int32_t* lens) {
    std::memset(out, 0, (size_t)(B * L));
    for (int64_t i = 0; i < B; ++i) {
        int64_t a = offsets[i], b = offsets[i + 1];
        int64_t m = b - a;
        if (m > L) m = L;
        std::memcpy(out + i * L, joined + a, (size_t)m);
        lens[i] = (int32_t)m;
    }
}

}  // extern "C"
