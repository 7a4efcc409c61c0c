// Native succinct integer codecs for metagenome_vector_sketches_tpu.
//
// Byte-identical with the executable spec in
// metagenome_vector_sketches_tpu/codecs/pyref.py (see FORMATS.md). These are
// the framework's replacement for the reference's `bits` submodule
// (compact_vector / rice_sequence / elias_fano; reference usage at
// pairwise_comp_optimized.cpp:309-330 and read_pc_mat_cmp.cpp:133-175).
//
// C ABI for ctypes. All buffers returned through out-params are malloc'd and
// must be released with mvs_free(). All formats are little-endian u64 headers
// followed by u64 word streams; bit 0 of word 0 is the first bit.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

class BitWriter {
public:
    // append the low `nbits` of `value` (nbits <= 64)
    void append(uint64_t value, unsigned nbits) {
        if (nbits == 0) return;
        if (nbits < 64) value &= (uint64_t(1) << nbits) - 1;
        unsigned shift = bitpos_ & 63;
        size_t widx = bitpos_ >> 6;
        if (widx >= words_.size()) words_.resize(widx + 2, 0);
        words_[widx] |= value << shift;
        if (shift + nbits > 64) {
            if (widx + 1 >= words_.size()) words_.resize(widx + 2, 0);
            words_[widx + 1] |= value >> (64 - shift);
        }
        bitpos_ += nbits;
    }
    void append_ones(uint64_t count) {
        while (count >= 64) { append(~uint64_t(0), 64); count -= 64; }
        if (count) append((uint64_t(1) << count) - 1, (unsigned)count);
    }
    void set_bit(uint64_t pos) {  // random-access set (elias-fano high bits)
        size_t widx = pos >> 6;
        if (widx >= words_.size()) words_.resize(widx + 1, 0);
        words_[widx] |= uint64_t(1) << (pos & 63);
    }
    uint64_t num_bits() const { return bitpos_; }
    std::vector<uint64_t> take(uint64_t num_words) {
        words_.resize(num_words, 0);
        return std::move(words_);
    }

private:
    std::vector<uint64_t> words_;
    uint64_t bitpos_ = 0;
};

class BitReader {
public:
    BitReader(const uint64_t* words, uint64_t num_words)
        : words_(words), num_words_(num_words) {}
    uint64_t read(unsigned nbits) {
        if (nbits == 0) return 0;
        size_t widx = bitpos_ >> 6;
        unsigned shift = bitpos_ & 63;
        uint64_t lo = word(widx) >> shift;
        uint64_t v = lo;
        if (shift + nbits > 64) v |= word(widx + 1) << (64 - shift);
        bitpos_ += nbits;
        if (nbits < 64) v &= (uint64_t(1) << nbits) - 1;
        return v;
    }
    uint64_t read_unary() {  // count ones until a zero, consume the zero
        uint64_t q = 0;
        for (;;) {
            size_t widx = bitpos_ >> 6;
            unsigned shift = bitpos_ & 63;
            uint64_t w = ~(word(widx) >> shift);  // zeros become ones
            if (w != 0) {
                unsigned tz = (unsigned)__builtin_ctzll(w);
                if (tz < 64u - shift) {
                    q += tz;
                    bitpos_ += tz + 1;
                    return q;
                }
            }
            q += 64 - shift;
            bitpos_ += 64 - shift;
        }
    }

private:
    uint64_t word(size_t i) const { return i < num_words_ ? words_[i] : 0; }
    const uint64_t* words_;
    uint64_t num_words_;
    uint64_t bitpos_ = 0;
};

unsigned bit_length(uint64_t x) { return x ? 64 - (unsigned)__builtin_clzll(x) : 0; }

uint8_t* emit(const std::vector<uint64_t>& header,
              const std::vector<const std::vector<uint64_t>*>& parts,
              uint64_t* out_len) {
    uint64_t len = header.size() * 8;
    for (auto* p : parts) len += p->size() * 8;
    uint8_t* buf = (uint8_t*)std::malloc(len ? len : 1);
    if (!buf) return nullptr;
    uint64_t off = 0;
    std::memcpy(buf + off, header.data(), header.size() * 8);
    off += header.size() * 8;
    for (auto* p : parts) {
        std::memcpy(buf + off, p->data(), p->size() * 8);
        off += p->size() * 8;
    }
    *out_len = len;
    return buf;
}

uint64_t rd(const uint8_t* buf, uint64_t off) {
    uint64_t v;
    std::memcpy(&v, buf + off, 8);
    return v;
}

// wrap-safe bounds check: `off + need > len` wraps modulo 2^64 when a
// corrupt row address sits near UINT64_MAX (addresses are cumsums of
// untrusted rice-decoded deltas), letting rd() read wild memory
bool in_bounds(uint64_t off, uint64_t need, uint64_t len) {
    return off <= len && len - off >= need;
}

// valid rice streams carry >= one zero terminator bit per value; corrupt
// all-ones content would otherwise decode to garbage (BitReader treats
// past-end words as zero) where the python decoder raises
bool rice_has_terminators(const uint64_t* words, uint64_t num_words,
                          uint64_t size) {
    uint64_t ones = 0;
    for (uint64_t i = 0; i < num_words; ++i)
        ones += (uint64_t)__builtin_popcountll(words[i]);
    return num_words * 64 - ones >= size;
}

}  // namespace

// every C-ABI entry runs under this guard: a corrupt aliasing header can
// drive multi-GB resizes whose std::bad_alloc would otherwise escape the
// extern "C" frame and terminate the host Python process
#define MVS_GUARD_BEGIN try {
#define MVS_GUARD_END } catch (...) { return -3; }

extern "C" {

void mvs_free(void* p) { std::free(p); }

// ---------------------------------------------------------------- compact_vector
static void cv_encode_into(const uint64_t* vals, uint64_t n,
                           std::vector<uint8_t>& out) {
    uint64_t mx = 0;
    for (uint64_t i = 0; i < n; ++i) mx = vals[i] > mx ? vals[i] : mx;
    unsigned width = mx ? bit_length(mx) : 1;
    BitWriter bw;
    for (uint64_t i = 0; i < n; ++i) bw.append(vals[i], width);
    uint64_t num_words = (n * width + 63) / 64;
    auto words = bw.take(num_words);
    uint64_t header[3] = {n, (uint64_t)width, num_words};
    size_t off = out.size();
    out.resize(off + 24 + num_words * 8);
    std::memcpy(out.data() + off, header, 24);
    std::memcpy(out.data() + off + 24, words.data(), num_words * 8);
}

int mvs_cv_encode(const uint64_t* vals, uint64_t n, uint8_t** out, uint64_t* out_len) {
    MVS_GUARD_BEGIN
    std::vector<uint8_t> buf;
    cv_encode_into(vals, n, buf);
    *out = (uint8_t*)std::malloc(buf.size() ? buf.size() : 1);
    if (!*out) return -3;
    std::memcpy(*out, buf.data(), buf.size());
    *out_len = buf.size();
    return 0;
    MVS_GUARD_END
}

int mvs_cv_decode(const uint8_t* buf, uint64_t len, uint64_t offset,
                  uint64_t** vals, uint64_t* n, uint64_t* consumed) {
    MVS_GUARD_BEGIN
    if (!in_bounds(offset, 24, len)) return -1;
    uint64_t size = rd(buf, offset), width = rd(buf, offset + 8),
             num_words = rd(buf, offset + 16);
    // division form: the multiply/add would wrap uint64 on corrupt counts
    if (num_words > (len - offset - 24) / 8) return -1;
    // width-aware cap (matches codecs/pyref.py): n values of `width` bits
    // need n*width <= 64*words; a width-blind slack admits crafted sizes
    if (width > 64 || width < 1 || size > num_words * 64 / width) return -1;
    std::vector<uint64_t> words(num_words);
    std::memcpy(words.data(), buf + offset + 24, num_words * 8);
    uint64_t* out = (uint64_t*)std::malloc(size ? size * 8 : 8);
    if (!out) return -3;
    BitReader br(words.data(), num_words);
    for (uint64_t i = 0; i < size; ++i) out[i] = br.read((unsigned)width);
    *vals = out;
    *n = size;
    *consumed = 24 + num_words * 8;
    return 0;
    MVS_GUARD_END
}

// ---------------------------------------------------------------- rice_sequence
static unsigned rice_pick_param(const uint64_t* vals, uint64_t n) {
    if (n == 0) return 0;
    unsigned best_l = 0;
    uint64_t best_bits = ~uint64_t(0);
    for (unsigned l = 0; l < 64; ++l) {
        uint64_t total = n * (uint64_t)(1 + l);
        for (uint64_t i = 0; i < n; ++i) total += vals[i] >> l;
        if (total < best_bits) { best_bits = total; best_l = l; }
    }
    return best_l;
}

static void rice_encode_into(const uint64_t* vals, uint64_t n,
                             std::vector<uint8_t>& out) {
    unsigned l = rice_pick_param(vals, n);
    BitWriter bw;
    for (uint64_t i = 0; i < n; ++i) {
        uint64_t q = vals[i] >> l;
        bw.append_ones(q);
        bw.append(0, 1);
        if (l) bw.append(vals[i], l);
    }
    uint64_t num_words = (bw.num_bits() + 63) / 64;
    auto words = bw.take(num_words);
    uint64_t header[3] = {n, (uint64_t)l, num_words};
    size_t off = out.size();
    out.resize(off + 24 + num_words * 8);
    std::memcpy(out.data() + off, header, 24);
    std::memcpy(out.data() + off + 24, words.data(), num_words * 8);
}

int mvs_rice_encode(const uint64_t* vals, uint64_t n, uint8_t** out, uint64_t* out_len) {
    MVS_GUARD_BEGIN
    std::vector<uint8_t> buf;
    rice_encode_into(vals, n, buf);
    *out = (uint8_t*)std::malloc(buf.size() ? buf.size() : 1);
    if (!*out) return -3;
    std::memcpy(*out, buf.data(), buf.size());
    *out_len = buf.size();
    return 0;
    MVS_GUARD_END
}

// ------------------------------------------------- batched shard-row writer
// Build the ACTIVE-format matrix.bin body in ONE call (the per-row python
// loop with two ctypes round trips per row was the write-stage bottleneck at
// production shard sizes). For row k, entries [starts[k], starts[k+1]) of
// (cols ascending, quantized jaccards): cv(q_row) then, iff >1 neighbor,
// rice(col deltas) — byte-identical with calling mvs_cv_encode /
// mvs_rice_encode per row (reference layout:
// pairwise_comp_optimized.cpp:724-762).
// Outputs: blob, per-row byte positions, per-row first neighbor column.
int mvs_write_matrix_rows(const uint64_t* cols, const uint64_t* q,
                          const uint64_t* starts, uint64_t n_rows,
                          uint8_t** out, uint64_t* out_len,
                          uint64_t** positions, uint64_t** first_cols) {
    MVS_GUARD_BEGIN
    std::vector<uint8_t> blob;
    blob.reserve(n_rows * 64);
    uint64_t* pos = (uint64_t*)std::malloc(n_rows ? n_rows * 8 : 8);
    uint64_t* first = (uint64_t*)std::malloc(n_rows ? n_rows * 8 : 8);
    if (!pos || !first) { std::free(pos); std::free(first); return -3; }
    std::vector<uint64_t> deltas;
    for (uint64_t k = 0; k < n_rows; ++k) {
        uint64_t s = starts[k], e = starts[k + 1];
        if (e <= s) { std::free(pos); std::free(first); return -1; }
        pos[k] = blob.size();
        first[k] = cols[s];
        cv_encode_into(q + s, e - s, blob);
        if (e - s > 1) {
            deltas.resize(e - s - 1);
            for (uint64_t i = s + 1; i < e; ++i) {
                if (cols[i] <= cols[i - 1]) {  // must be strictly ascending
                    std::free(pos); std::free(first);
                    return -2;
                }
                deltas[i - s - 1] = cols[i] - cols[i - 1];
            }
            rice_encode_into(deltas.data(), deltas.size(), blob);
        }
    }
    *out = (uint8_t*)std::malloc(blob.size() ? blob.size() : 1);
    if (!*out) { std::free(pos); std::free(first); return -3; }
    std::memcpy(*out, blob.data(), blob.size());
    *out_len = blob.size();
    *positions = pos;
    *first_cols = first;
    return 0;
    MVS_GUARD_END
}

int mvs_rice_decode(const uint8_t* buf, uint64_t len, uint64_t offset,
                    uint64_t** vals, uint64_t* n, uint64_t* consumed) {
    MVS_GUARD_BEGIN
    if (!in_bounds(offset, 24, len)) return -1;
    uint64_t size = rd(buf, offset), l = rd(buf, offset + 8),
             num_words = rd(buf, offset + 16);
    if (num_words > (len - offset - 24) / 8) return -1;
    // param-aware cap (matches codecs/pyref.py): each value consumes at
    // least 1+l bits (terminator + payload)
    if (l > 63 || size > num_words * 64 / (1 + l)) return -1;
    std::vector<uint64_t> words(num_words);
    std::memcpy(words.data(), buf + offset + 24, num_words * 8);
    if (!rice_has_terminators(words.data(), num_words, size)) return -1;
    uint64_t* out = (uint64_t*)std::malloc(size ? size * 8 : 8);
    if (!out) return -3;
    BitReader br(words.data(), num_words);
    for (uint64_t i = 0; i < size; ++i) {
        uint64_t q = br.read_unary();
        uint64_t rem = l ? br.read((unsigned)l) : 0;
        out[i] = (q << l) | rem;
    }
    *vals = out;
    *n = size;
    *consumed = 24 + num_words * 8;
    return 0;
    MVS_GUARD_END
}

// ------------------------------------------------- batched shard-row reader
// Decode many ACTIVE-format rows in one call (the query stack's per-row
// python loop paid two ctypes round trips per row). For row k at byte
// offset addrs[k] with first neighbor column first_cols[k]: cv(quantized
// jaccards), then iff >1 neighbor rice(col deltas); emits concatenated
// neighbor columns (prefix-summed) + quantized values + row boundaries.
int mvs_read_matrix_rows(const uint8_t* buf, uint64_t len,
                         const uint64_t* addrs, const uint64_t* first_cols,
                         uint64_t n_rows,
                         uint64_t** cols_out, uint64_t** q_out,
                         uint64_t** bounds_out) {
    MVS_GUARD_BEGIN
    std::vector<uint64_t> cols, q, bounds;
    bounds.reserve(n_rows + 1);
    bounds.push_back(0);
    for (uint64_t k = 0; k < n_rows; ++k) {
        uint64_t off = addrs[k];
        // in_bounds: addrs are cumsums of UNTRUSTED rice-decoded deltas —
        // an off near UINT64_MAX would wrap `off + 24 > len` and read wild
        if (!in_bounds(off, 24, len)) return -1;
        uint64_t size = rd(buf, off), width = rd(buf, off + 8),
                 num_words = rd(buf, off + 16);
        // division form avoids uint64 wrap on corrupt num_words; size==0
        // rows cannot exist (the writer rejects empty rows, e<=s) — a
        // corrupt zero-size header would otherwise drive cols[base] past
        // the vector end below; width-aware cap matches mvs_cv_decode
        if (size == 0 || width > 64 || width < 1 ||
            num_words > (len - off - 24) / 8 ||
            size > num_words * 64 / width) return -1;
        std::vector<uint64_t> words(num_words);
        std::memcpy(words.data(), buf + off + 24, num_words * 8);
        size_t base = q.size();
        q.resize(base + size);
        {
            BitReader br(words.data(), num_words);
            for (uint64_t i = 0; i < size; ++i)
                q[base + i] = br.read((unsigned)width);
        }
        cols.resize(base + size);
        cols[base] = first_cols[k];
        if (size > 1) {
            uint64_t off2 = off + 24 + num_words * 8;
            if (!in_bounds(off2, 24, len)) return -1;
            uint64_t dn = rd(buf, off2), l = rd(buf, off2 + 8),
                     dwords = rd(buf, off2 + 16);
            if (l > 63 || dn != size - 1 ||
                dwords > (len - off2 - 24) / 8 ||
                dn > dwords * 64 / (1 + l)) return -1;
            std::vector<uint64_t> dw(dwords);
            std::memcpy(dw.data(), buf + off2 + 24, dwords * 8);
            if (!rice_has_terminators(dw.data(), dwords, dn)) return -1;
            BitReader br(dw.data(), dwords);
            uint64_t cur = first_cols[k];
            for (uint64_t i = 0; i < dn; ++i) {
                uint64_t qq = br.read_unary();
                uint64_t rem = l ? br.read((unsigned)l) : 0;
                cur += (qq << l) | rem;
                cols[base + 1 + i] = cur;
            }
        }
        bounds.push_back(q.size());
    }
    auto dup = [](const std::vector<uint64_t>& v) -> uint64_t* {
        uint64_t* p = (uint64_t*)std::malloc(v.size() ? v.size() * 8 : 8);
        if (p) std::memcpy(p, v.data(), v.size() * 8);
        return p;
    };
    uint64_t* pc = dup(cols);
    uint64_t* pq = dup(q);
    uint64_t* pb = dup(bounds);
    if (!pc || !pq || !pb) {
        std::free(pc); std::free(pq); std::free(pb);
        return -3;
    }
    *cols_out = pc;
    *q_out = pq;
    *bounds_out = pb;
    return 0;
    MVS_GUARD_END
}

// ---------------------------------------------------------------- elias_fano
int mvs_ef_encode(const uint64_t* vals, uint64_t n, uint64_t universe,
                  uint8_t** out, uint64_t* out_len) {
    MVS_GUARD_BEGIN
    if (universe < 1) universe = 1;
    unsigned l = 0;
    if (n) {
        uint64_t q = universe / n;
        l = q ? bit_length(q) - 1 : 0;
    }
    BitWriter low;
    if (l)
        for (uint64_t i = 0; i < n; ++i) low.append(vals[i], l);
    uint64_t num_low = (n * (uint64_t)l + 63) / 64;
    auto low_words = low.take(num_low);

    uint64_t high_bits = n + (universe >> l) + 1;
    uint64_t num_high = (high_bits + 63) / 64;
    BitWriter high;
    for (uint64_t i = 0; i < n; ++i) high.set_bit((vals[i] >> l) + i);
    auto high_words = high.take(num_high);

    std::vector<uint64_t> nh = {num_high};
    // layout: [n][universe][l][num_low][low...][num_high][high...]
    std::vector<uint64_t> header = {n, universe, (uint64_t)l, num_low};
    *out = emit(header, {&low_words, &nh, &high_words}, out_len);
    if (!*out) return -3;
    return 0;
    MVS_GUARD_END
}

int mvs_ef_decode(const uint8_t* buf, uint64_t len, uint64_t offset,
                  uint64_t** vals, uint64_t* n, uint64_t* consumed) {
    MVS_GUARD_BEGIN
    if (!in_bounds(offset, 32, len)) return -1;
    uint64_t size = rd(buf, offset), universe = rd(buf, offset + 8),
             l = rd(buf, offset + 16), num_low = rd(buf, offset + 24);
    (void)universe;
    // division-form bounds (the multiply would wrap uint64 on corrupt
    // counts) + allocation caps derived from the bits actually present:
    // every element sets exactly ONE high bit and consumes l low bits,
    // so a corrupt `size` cannot drive the output malloc past ~8x the
    // encoded byte count (an ASAN fuzz found a multi-TB malloc here)
    if (l > 63) return -1;
    if (!in_bounds(offset, 40, len)) return -1;  // header + num_high field
    if (num_low > (len - offset - 40) / 8) return -1;
    uint64_t pos = offset + 32;
    std::vector<uint64_t> low_words(num_low);
    std::memcpy(low_words.data(), buf + pos, num_low * 8);
    pos += num_low * 8;
    uint64_t num_high = rd(buf, pos);
    pos += 8;
    if (num_high > (len - pos) / 8) return -1;
    if (size > num_high * 64) return -1;
    if (l && size > num_low * 64 / l) return -1;
    std::vector<uint64_t> high_words(num_high);
    std::memcpy(high_words.data(), buf + pos, num_high * 8);
    pos += num_high * 8;

    uint64_t* out = (uint64_t*)std::malloc(size ? size * 8 : 8);
    if (!out) return -3;
    BitReader low(low_words.data(), num_low);
    // scan set bits of the high vector in order
    uint64_t found = 0;
    for (uint64_t w = 0; w < num_high && found < size; ++w) {
        uint64_t word = high_words[w];
        while (word && found < size) {
            unsigned tz = (unsigned)__builtin_ctzll(word);
            uint64_t bitpos = w * 64 + tz;
            uint64_t hi = bitpos - found;
            uint64_t lo = l ? low.read((unsigned)l) : 0;
            out[found] = (hi << l) | lo;
            ++found;
            word &= word - 1;
        }
    }
    if (found < size) {  // corrupt: fewer high bits than elements —
        std::free(out);  // out would otherwise leak uninitialized heap
        return -1;
    }
    *vals = out;
    *n = size;
    *consumed = pos - offset;
    return 0;
    MVS_GUARD_END
}

}  // extern "C"
