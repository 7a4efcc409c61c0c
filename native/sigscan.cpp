// Native sourmash .sig.zip scanner for the ingest hot path.
//
// Reference behavior (clean-room, from /root/reference/src/project_everything.cpp:73-151):
// extract every *.sig.gz member of the zip, gunzip it, and scan the JSON text
// sequentially for "ksize":K records, collecting the following "mins" array
// when K matches (sourmash serializes ksize before mins in each signature
// object). The reference does this with unzip/gunzip shellouts + a hand-rolled
// scan; here it is fully in-process: a minimal ZIP central-directory reader,
// zlib raw-inflate for deflated members, zlib gzip-inflate for the .sig.gz
// payloads, and the same sequential scan.
//
// C ABI (ctypes): sigscan_read(path, ksize, &out) -> count (>=0) or -errcode;
// caller frees with sigscan_free. Any structural surprise returns an error so
// the Python caller can fall back to the zipfile/gzip/json path.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

struct Buf {
    const uint8_t* p;
    size_t n;
};

uint16_t rd16(const uint8_t* p) { return (uint16_t)(p[0] | (p[1] << 8)); }
uint32_t rd32(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
           ((uint32_t)p[3] << 24);
}

constexpr size_t kMaxInflate = size_t(1) << 30;  // 1 GiB sanity bound

bool inflate_buf(const uint8_t* src, size_t src_n, int window_bits,
                 std::vector<uint8_t>& out, size_t size_hint) {
    // the hint comes from the (untrusted) gzip ISIZE trailer — clamp it so a
    // corrupt trailer cannot drive a multi-GiB zero-filled allocation
    if (size_hint > kMaxInflate) size_hint = 0;
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    if (inflateInit2(&zs, window_bits) != Z_OK) return false;
    out.clear();
    out.resize(size_hint ? size_hint : (src_n * 4 + 1024));
    zs.next_in = const_cast<Bytef*>(src);
    zs.avail_in = (uInt)src_n;
    size_t written = 0;
    for (;;) {
        int rc = Z_OK;
        while (rc != Z_STREAM_END) {
            if (written == out.size()) {
                if (out.size() >= kMaxInflate) {
                    inflateEnd(&zs);
                    return false;
                }
                out.resize(out.size() * 2);
            }
            zs.next_out = out.data() + written;
            zs.avail_out = (uInt)(out.size() - written);
            rc = inflate(&zs, Z_NO_FLUSH);
            written = out.size() - zs.avail_out;
            if (rc != Z_OK && rc != Z_STREAM_END) {
                inflateEnd(&zs);
                return false;
            }
            if (rc == Z_OK && zs.avail_in == 0 && zs.avail_out != 0) {
                inflateEnd(&zs);
                return false;  // truncated stream
            }
        }
        // gzip allows concatenated members (gzip.decompress reads them all);
        // continue with the next member instead of silently dropping it.
        // Raw/zlib streams (zip entries) legitimately end mid-buffer.
        if (window_bits >= 16 && zs.avail_in > 0) {
            if (inflateReset(&zs) != Z_OK) {
                inflateEnd(&zs);
                return false;
            }
            continue;
        }
        break;
    }
    inflateEnd(&zs);
    out.resize(written);
    return true;
}

// Sequential scan of signature JSON: every "ksize": K, and if K == want the
// next "mins":[...] array (before any subsequent "ksize"). Returns false on
// any structural surprise (unexpected character in the array, non-numeric
// ksize) so the caller falls back to the full-JSON python path instead of
// silently returning a truncated hash set.
bool scan_json(const uint8_t* text, size_t n, int want,
               std::vector<uint64_t>& out) {
    const char* s = reinterpret_cast<const char*>(text);
    size_t i = 0;
    auto is_ws = [](char c) {
        return c == ' ' || c == '\t' || c == '\n' || c == '\r';
    };
    auto find = [&](const char* needle, size_t from) -> size_t {
        size_t len = std::strlen(needle);
        if (from >= n || len > n - from) return std::string::npos;
        const void* hit = memmem(s + from, n - from, needle, len);
        if (!hit) return std::string::npos;
        return (size_t)((const char*)hit - s);
    };
    // the sequential scan assumes sourmash's key order ("ksize" before its
    // record's "mins"). Count every "mins" occurrence up front and require
    // the scan below to ATTRIBUTE all of them to a record — any leftover
    // (a record serialized mins-first, anywhere in the file, not just
    // before the first ksize) means a different serializer: refuse so the
    // caller uses the full-JSON python path instead of silently dropping
    // that record's hashes.
    uint64_t total_mins = 0, attributed_mins = 0;
    for (size_t p = find("\"mins\"", 0); p != std::string::npos;
         p = find("\"mins\"", p + 1))
        ++total_mins;
    while (true) {
        size_t k = find("\"ksize\"", i);
        if (k == std::string::npos) break;
        size_t j = k + 7;
        while (j < n && (s[j] == ':' || is_ws(s[j]))) j++;
        if (j >= n || s[j] < '0' || s[j] > '9') return false;
        long ks = 0;
        int ks_digits = 0;
        while (j < n && s[j] >= '0' && s[j] <= '9') {
            if (++ks_digits > 9) return false;  // ksize is a small int —
            ks = ks * 10 + (s[j++] - '0');      // more is a surprise (and
        }                                       // would overflow: UB)
        size_t next_k = find("\"ksize\"", j);
        i = (next_k == std::string::npos) ? n : next_k;
        size_t m = find("\"mins\"", j);
        bool has_mins = m != std::string::npos &&
                        (next_k == std::string::npos || m < next_k);
        // a record boundary between a ksize and the following mins means the
        // mins belongs to a DIFFERENT record (mins-before-ksize ordering) —
        // refuse rather than mis-attribute or drop it (string values
        // containing '}' also land here; the python path handles those).
        // This must run for EVERY record, not just matching ksizes, or a
        // wanted record whose mins precedes its ksize is silently skipped.
        if (has_mins && memchr(s + j, '}', m - j) != nullptr) return false;
        if (has_mins) ++attributed_mins;
        if (ks != want) {
            if (next_k == std::string::npos) break;
            continue;
        }
        if (!has_mins)
            continue;  // this signature has no mins before the next one
        size_t p = m + 6;
        while (p < n && (s[p] == ':' || is_ws(s[p]))) p++;
        if (p >= n || s[p] != '[') return false;
        p++;
        while (true) {
            while (p < n && (s[p] == ',' || is_ws(s[p]))) p++;
            if (p >= n) return false;              // unterminated array
            if (s[p] == ']') break;
            if (s[p] < '0' || s[p] > '9') return false;  // unexpected token
            uint64_t v = 0;
            while (p < n && s[p] >= '0' && s[p] <= '9') {
                uint64_t digit = (uint64_t)(s[p] - '0');
                if (v > (~uint64_t(0) - digit) / 10)
                    return false;  // hash > 2^64 would silently wrap —
                v = v * 10 + digit;  // structural surprise, use fallback
                p++;
            }
            out.push_back(v);
        }
        if (next_k == std::string::npos) break;
    }
    // any "mins" never attributed to a record = a serializer this scan
    // does not understand (e.g. a LATER record with mins before ksize)
    return attributed_mins == total_mins;
}

}  // namespace

extern "C" {

// Returns number of hashes (duplicates possible across members; caller
// dedups), or a negative error code. *out is malloc'd. No C++ exception may
// escape the C ABI (std::bad_alloc on a corrupt size would otherwise abort
// the host process).
int64_t sigscan_read(const char* path, int ksize, uint64_t** out) try {
    *out = nullptr;
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long fsz = std::ftell(f);
    if (fsz <= 0) { std::fclose(f); return -2; }
    std::vector<uint8_t> file((size_t)fsz);
    std::fseek(f, 0, SEEK_SET);
    if (std::fread(file.data(), 1, (size_t)fsz, f) != (size_t)fsz) {
        std::fclose(f);
        return -3;
    }
    std::fclose(f);

    // End-of-central-directory: scan back over at most 64KiB comment
    const uint8_t* d = file.data();
    size_t n = file.size();
    if (n < 22) return -4;
    size_t eocd = std::string::npos;
    size_t lo = n >= (size_t)(22 + 65535) ? n - 22 - 65535 : 0;
    for (size_t i = n - 22 + 1; i-- > lo;) {
        if (rd32(d + i) == 0x06054b50) { eocd = i; break; }
    }
    if (eocd == std::string::npos) return -5;
    uint16_t n_entries = rd16(d + eocd + 10);
    uint32_t cd_off = rd32(d + eocd + 16);
    if (cd_off == 0xFFFFFFFF || n_entries == 0xFFFF) return -6;  // zip64: fall back

    std::vector<uint64_t> hashes;
    std::vector<uint8_t> raw, text;
    size_t pos = cd_off;
    for (uint16_t e = 0; e < n_entries; e++) {
        if (pos + 46 > n || rd32(d + pos) != 0x02014b50) return -7;
        uint16_t method = rd16(d + pos + 10);
        uint32_t csize = rd32(d + pos + 20);
        uint32_t usize = rd32(d + pos + 24);
        uint16_t name_len = rd16(d + pos + 28);
        uint16_t extra_len = rd16(d + pos + 30);
        uint16_t comment_len = rd16(d + pos + 32);
        uint32_t lho = rd32(d + pos + 42);
        // the variable-length fields must fit the buffer BEFORE the name is
        // materialized (a truncated zip with a large name_len would read up
        // to 64 KiB past the allocation)
        if (pos + 46 + (size_t)name_len + extra_len + comment_len > n)
            return -7;
        std::string name((const char*)(d + pos + 46), name_len);
        pos += 46 + (size_t)name_len + extra_len + comment_len;
        if (name.size() < 7 || name.compare(name.size() - 7, 7, ".sig.gz") != 0)
            continue;
        if (csize == 0xFFFFFFFF || usize == 0xFFFFFFFF) return -6;
        if ((size_t)lho + 30 > n || rd32(d + lho) != 0x04034b50) return -8;
        size_t data_off = (size_t)lho + 30 + rd16(d + lho + 26) + rd16(d + lho + 28);
        if (data_off + csize > n) return -9;

        const uint8_t* gz;
        size_t gz_n;
        if (method == 0) {
            gz = d + data_off;
            gz_n = csize;
        } else if (method == 8) {
            if (!inflate_buf(d + data_off, csize, -MAX_WBITS, raw, usize))
                return -10;
            gz = raw.data();
            gz_n = raw.size();
        } else {
            return -11;
        }
        // gzip payload: ISIZE (mod 2^32) in the trailer is the size hint
        size_t hint = gz_n >= 4 ? rd32(gz + gz_n - 4) : 0;
        if (!inflate_buf(gz, gz_n, 16 + MAX_WBITS, text, hint)) return -12;
        if (!scan_json(text.data(), text.size(), ksize, hashes)) return -14;
    }

    uint64_t* res = (uint64_t*)std::malloc(sizeof(uint64_t) *
                                           (hashes.empty() ? 1 : hashes.size()));
    if (!res) return -13;
    std::memcpy(res, hashes.data(), sizeof(uint64_t) * hashes.size());
    *out = res;
    return (int64_t)hashes.size();
} catch (...) {
    *out = nullptr;
    return -15;
}

void sigscan_free(uint64_t* p) { std::free(p); }

// ---------------------------------------------------------------------------
// all_hashes.txt parser ("<name>: h1 h2 ...\n" per line — the writer/parser
// contract of io/hashes.py; reference format project_everything.cpp:222-281).
// One pass over the whole file: *hashes_out gets every value concatenated,
// *offsets_out the (nlines+1) int64 prefix, *names_out the '\n'-joined
// names. Per-line sort/dedup stays in numpy (np.unique on small arrays is
// not the bottleneck; tokenizing 7e7 decimal u64s in Python is). Lines
// without ':' are skipped, like the Python parser; any malformed numeric
// token returns an error so the caller falls back to the Python path.
int64_t hashparse_read(const char* path, uint64_t** hashes_out,
                       int64_t** offsets_out, char** names_out,
                       int64_t* names_len_out) try {
    *hashes_out = nullptr;
    *offsets_out = nullptr;
    *names_out = nullptr;
    *names_len_out = 0;
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long fsz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (fsz < 0) { std::fclose(f); return -2; }
    // TWO passes over raw malloc'd buffers, no std::vector growth: on this
    // class of VM, interleaving parse work with incremental first-touch /
    // realloc of growing vectors measured ~30 MB/s; counting first and
    // storing into exactly-sized outputs runs ~150 MB/s end to end.
    char* data = (char*)std::malloc((size_t)fsz + 1);
    if (!data) { std::fclose(f); return -6; }
    if (fsz && std::fread(data, 1, (size_t)fsz, f) != (size_t)fsz) {
        std::free(data);
        std::fclose(f);
        return -3;
    }
    std::fclose(f);
    data[(size_t)fsz] = '\n';                 // sentinel terminator
    const char* end = data + fsz;
    // pass 1: count colon-lines, digit runs (>= stored tokens), name bytes
    size_t lines = 0, tokens = 0, nbytes = 0;
    for (const char* p = data; p < end; ) {
        const char* nl = (const char*)std::memchr(p, '\n', (size_t)(end - p));
        if (!nl) nl = end;
        const char* colon = (const char*)std::memchr(p, ':', (size_t)(nl - p));
        if (colon) {
            lines++;
            nbytes += (size_t)(colon - p) + 1;
            int in_tok = 0;
            for (const char* q = colon + 1; q < nl; q++) {
                int dig = (*q >= '0' && *q <= '9');
                tokens += (size_t)(dig & ~in_tok);
                in_tok = dig;
            }
        }
        p = nl + 1;
    }
    uint64_t* h = (uint64_t*)std::malloc(sizeof(uint64_t) *
                                         (tokens ? tokens : 1));
    int64_t* o = (int64_t*)std::malloc(sizeof(int64_t) * (lines + 1));
    char* nm = (char*)std::malloc(nbytes ? nbytes : 1);
    if (!h || !o || !nm) {
        std::free(h); std::free(o); std::free(nm); std::free(data);
        return -6;
    }
    uint64_t* hw = h;
    int64_t* ow = o;
    char* nw = nm;
    *ow++ = 0;
    // pass 2: parse + store. Every stored token is one digit run, so the
    // pass-1 sizes bound the writes; malformed input errors before any
    // out-of-contract store.
    int err = 0;
    for (const char* p = data; p < end && !err; ) {
        const char* nl = (const char*)std::memchr(p, '\n', (size_t)(end - p));
        if (!nl) nl = end;
        const char* colon = (const char*)std::memchr(p, ':', (size_t)(nl - p));
        if (!colon) { p = nl + 1; continue; } // no ':' -> skip, like Python
        std::memcpy(nw, p, (size_t)(colon - p));
        nw += colon - p;
        *nw++ = '\n';
        const char* q = colon + 1;
        while (q < nl) {
            while (q < nl && (*q == ' ' || *q == '\t' || *q == '\r')) q++;
            if (q >= nl) break;
            if (*q < '0' || *q > '9') { err = -4; break; }  // malformed
            uint64_t v = 0;
            while (q < nl && *q >= '0' && *q <= '9') {
                uint64_t dig = (uint64_t)(*q - '0');
                // full overflow predicate: (nv < v) alone misses wraps
                // that land ABOVE v (e.g. "46116860184273879040" wraps to
                // 2^63 > 2^62) and would silently store a corrupt hash
                // instead of falling back to the loud Python parser
                if (v > (UINT64_MAX - dig) / 10) { err = -5; break; }
                v = v * 10 + dig;
                q++;
            }
            if (err) break;
            if (q < nl && *q != ' ' && *q != '\t' && *q != '\r') {
                err = -4;
                break;
            }
            *hw++ = v;
        }
        *ow++ = (int64_t)(hw - h);
        p = nl + 1;
    }
    std::free(data);
    if (err) {
        std::free(h); std::free(o); std::free(nm);
        return err;
    }
    *hashes_out = h;
    *offsets_out = o;
    *names_out = nm;
    *names_len_out = (int64_t)nbytes;
    return (int64_t)lines;
} catch (...) {
    return -7;
}

void hashparse_free(void* p) { std::free(p); }

}  // extern "C"
