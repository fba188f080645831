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

struct Ctx {
    std::unordered_map<PairKey, int32_t, PairKeyHash> ranks;
    std::vector<int32_t> rank_new;  // rank -> minted id (-1 gaps)
    int32_t byte_token[256];
    // GPT-2 classes per codepoint: 0=other,1=ws,2=letter,3=number
    const uint8_t* cls_table;  // borrowed; caller keeps alive
    int64_t cls_size;
};

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
    return c;
}

void ctok_free(void* p) { delete (Ctx*)p; }

// Full host encode of one UTF-8 text (already normalized, prefix-space
// already applied).  Writes ids into out (capacity n, one id per input byte
// is an upper bound).  Returns the id count.
int64_t ctok_encode(void* p, const uint8_t* data, int64_t n, int32_t* out) {
    Ctx* c = (Ctx*)p;
    if (n <= 0) return 0;
    int64_t n_out = 0;
    std::vector<int32_t> toks;
    toks.reserve(32);

    int64_t i = 0;
    while (i < n) {
        // classify current char
        uint32_t cp;
        int len = decode_cp(data, n, i, &cp);
        int cur_cls = cls_of(c, cp);

        int64_t start = i, end;
        // i is always a match start here, so the contraction alternatives
        // are tried first whenever the char is an apostrophe
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
            // optional single-space absorption
            int64_t j = i;
            int run_cls = cur_cls;
            if (data[i] == ' ' && i + 1 < n) {
                uint32_t cp2;
                int l2 = decode_cp(data, n, i + 1, &cp2);
                (void)l2;
                int c2 = cls_of(c, cp2);
                if (c2 != CL_WS) {
                    j = i + 1;
                    run_cls = c2;
                }
            }
            if (run_cls == CL_WS) {
                // whitespace run
                end = i;
                while (end < n) {
                    uint32_t cpr;
                    int lr = decode_cp(data, n, end, &cpr);
                    if (cls_of(c, cpr) != CL_WS) break;
                    end += lr;
                }
            } else {
                // greedy class run from j
                end = j;
                while (end < n) {
                    uint32_t cpr;
                    int lr = decode_cp(data, n, end, &cpr);
                    if (cls_of(c, cpr) != run_cls) break;
                    end += lr;
                }
            }
        }
        (void)len;
        (void)cur_cls;

        // seed + merge this word [start, end)
        toks.clear();
        for (int64_t k = start; k < end; ++k) {
            int32_t t = c->byte_token[data[k]];
            if (t >= 0) toks.push_back(t);
        }
        if (!toks.empty()) {
            merge_word(c, toks);
            for (int32_t t : toks) out[n_out++] = t;
        }
        i = end;
    }
    return n_out;
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
