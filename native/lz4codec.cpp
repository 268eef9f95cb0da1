// LZ4 block-format codec, written fresh from the published format
// description (lz4_Block_format.md): a block is a sequence of
// [token | literal-length ext | literals | offset(2, LE) | match-len ext]
// sequences; the last sequence is literals-only. Used by the binary USD
// crate reader/writer (basicrenderer_tpu/models/usdc.py) for the
// lz4-compressed sections modern pxr files carry (reference analogue:
// the USD SDK consumed by BasicRenderer/src/Import/USDLoader.cpp).
//
// The encoder is a greedy single-probe hash matcher — not ratio-optimal,
// but emits valid blocks every LZ4 decoder accepts, honoring the format's
// end conditions (last 5 bytes literal; no match starting within the last
// 12 bytes).

#include <cstdint>
#include <cstring>

extern "C" {

// Returns decompressed byte count, or -1 on malformed input / overflow.
int lz4_decompress(const uint8_t* src, int src_len,
                   uint8_t* dst, int dst_cap) {
    const uint8_t* ip = src;
    const uint8_t* const iend = src + src_len;
    uint8_t* op = dst;
    uint8_t* const oend = dst + dst_cap;
    if (src_len == 0) return 0;
    for (;;) {
        if (ip >= iend) return -1;
        const unsigned token = *ip++;
        // Literals.
        size_t lit = token >> 4;
        if (lit == 15) {
            unsigned b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                lit += b;
            } while (b == 255);
        }
        if (ip + lit > iend || op + lit > oend) return -1;
        std::memcpy(op, ip, lit);
        ip += lit;
        op += lit;
        if (ip == iend) break;           // last sequence: literals only
        // Match.
        if (ip + 2 > iend) return -1;
        const size_t offset = (size_t)ip[0] | ((size_t)ip[1] << 8);
        ip += 2;
        if (offset == 0 || (size_t)(op - dst) < offset) return -1;
        size_t mlen = token & 15;
        if (mlen == 15) {
            unsigned b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        mlen += 4;
        if (op + mlen > oend) return -1;
        const uint8_t* mp = op - offset;
        if (offset >= mlen) {
            std::memcpy(op, mp, mlen);
            op += mlen;
        } else {
            // Overlapping match: byte-wise forward copy is the semantics.
            while (mlen--) *op++ = *mp++;
        }
    }
    return (int)(op - dst);
}

// Worst-case compressed size for `n` input bytes (matches LZ4_compressBound).
int lz4_compress_bound(int n) { return n + n / 255 + 16; }

static inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

static inline uint32_t hash4(uint32_t v) {
    return (v * 2654435761u) >> 18;      // 14-bit table
}

static uint8_t* emit_seq(uint8_t* op, const uint8_t* lit_start, size_t lit,
                         size_t offset, size_t mlen_minus4) {
    uint8_t* token = op++;
    size_t l = lit;
    if (l >= 15) {
        *token = 15 << 4;
        l -= 15;
        while (l >= 255) { *op++ = 255; l -= 255; }
        *op++ = (uint8_t)l;
    } else {
        *token = (uint8_t)(l << 4);
    }
    std::memcpy(op, lit_start, lit);
    op += lit;
    if (offset) {                         // 0 = final literals-only call
        *op++ = (uint8_t)(offset & 0xff);
        *op++ = (uint8_t)(offset >> 8);
        size_t m = mlen_minus4;
        if (m >= 15) {
            *token |= 15;
            m -= 15;
            while (m >= 255) { *op++ = 255; m -= 255; }
            *op++ = (uint8_t)m;
        } else {
            *token |= (uint8_t)m;
        }
    }
    return op;
}

// Returns compressed size (callers size dst via lz4_compress_bound), or -1
// if dst_cap is too small.
int lz4_compress(const uint8_t* src, int src_len,
                 uint8_t* dst, int dst_cap) {
    if (dst_cap < lz4_compress_bound(src_len)) return -1;
    uint8_t* op = dst;
    if (src_len < 13) {                   // format minimum: all literals
        op = emit_seq(op, src, src_len, 0, 0);
        return (int)(op - dst);
    }
    int32_t table[1 << 14];
    std::memset(table, -1, sizeof(table));
    const uint8_t* anchor = src;
    const uint8_t* ip = src;
    // Matches must not start within the last 12 bytes; the final 5 bytes
    // are always literals.
    const uint8_t* const match_limit = src + src_len - 12;
    const uint8_t* const iend = src + src_len;
    while (ip <= match_limit) {
        const uint32_t h = hash4(read32(ip));
        const int32_t cand = table[h];
        table[h] = (int32_t)(ip - src);
        if (cand >= 0 && (size_t)(ip - (src + cand)) <= 0xffff &&
            read32(src + cand) == read32(ip)) {
            const uint8_t* mp = src + cand;
            // Extend the match (stop 5 bytes before the end).
            const uint8_t* p = ip + 4;
            const uint8_t* q = mp + 4;
            const uint8_t* const ext_limit = iend - 5;
            while (p < ext_limit && *p == *q) { ++p; ++q; }
            const size_t mlen = (size_t)(p - ip);
            op = emit_seq(op, anchor, (size_t)(ip - anchor),
                          (size_t)(ip - mp), mlen - 4);
            ip = p;
            anchor = ip;
        } else {
            ++ip;
        }
    }
    op = emit_seq(op, anchor, (size_t)(iend - anchor), 0, 0);
    return (int)(op - dst);
}

}  // extern "C"
