// neumann_native: hot host-path routines in C++.
//
// The reference implements its WAL framing, CRC checking, and id codecs
// in native Rust (tensor_store/src/wal.rs, tensor_compress codecs); this
// module is the C++ equivalent for the TPU build's host runtime, exposed
// to Python via ctypes. The Python implementations remain as the
// portable fallback and the format specification.
//
// Build: g++ -O3 -shared -fPIC neumann_native.cpp -o libneumann_native.so

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------
// CRC32 (IEEE, zlib-compatible), table-driven
// ---------------------------------------------------------------------
static uint32_t crc_table[256];
static bool crc_init_done = false;

static void crc_init() {
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_table[i] = c;
    }
    crc_init_done = true;
}

uint32_t nn_crc32(const uint8_t* buf, size_t len) {
    if (!crc_init_done) crc_init();
    uint32_t c = 0xFFFFFFFFu;
    for (size_t i = 0; i < len; i++)
        c = crc_table[(c ^ buf[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------
// WAL record framing: [len u32 LE][crc32 u32 LE][payload]
// ---------------------------------------------------------------------

// Frame one payload into out (caller allocates len+8). Returns bytes
// written.
size_t nn_wal_frame(const uint8_t* payload, size_t len, uint8_t* out) {
    uint32_t l = (uint32_t)len;
    uint32_t c = nn_crc32(payload, len);
    std::memcpy(out, &l, 4);
    std::memcpy(out + 4, &c, 4);
    std::memcpy(out + 8, payload, len);
    return len + 8;
}

// Scan a WAL buffer; writes (offset, length) pairs of VALID payloads
// into out (2*max entries). Stops at the first corrupt/torn record.
// Returns the number of records found.
size_t nn_wal_scan(const uint8_t* buf, size_t size,
                   uint64_t* out, size_t max_records) {
    size_t pos = 0, n = 0;
    while (n < max_records && pos + 8 <= size) {
        uint32_t len, crc;
        std::memcpy(&len, buf + pos, 4);
        std::memcpy(&crc, buf + pos + 4, 4);
        size_t start = pos + 8;
        if (start + len > size) break;              // torn tail
        if (nn_crc32(buf + start, len) != crc) break;  // corruption
        out[2 * n] = (uint64_t)start;
        out[2 * n + 1] = (uint64_t)len;
        n++;
        pos = start + len;
    }
    return n;
}

// ---------------------------------------------------------------------
// varint (LEB128, unsigned)
// ---------------------------------------------------------------------

// Returns bytes written; out must hold 10*n bytes worst case.
size_t nn_varint_encode(const uint64_t* vals, size_t n, uint8_t* out) {
    size_t o = 0;
    for (size_t i = 0; i < n; i++) {
        uint64_t v = vals[i];
        while (v >= 0x80) {
            out[o++] = (uint8_t)(v | 0x80);
            v >>= 7;
        }
        out[o++] = (uint8_t)v;
    }
    return o;
}

// Returns count decoded, or (size_t)-1 on truncation. out holds max_n.
size_t nn_varint_decode(const uint8_t* buf, size_t size,
                        uint64_t* out, size_t max_n) {
    size_t n = 0, pos = 0;
    while (pos < size && n < max_n) {
        uint64_t v = 0;
        int shift = 0;
        bool done = false;
        while (pos < size) {
            uint8_t b = buf[pos++];
            v |= (uint64_t)(b & 0x7F) << shift;
            if (!(b & 0x80)) { done = true; break; }
            shift += 7;
        }
        if (!done) return (size_t)-1;
        out[n++] = v;
    }
    return n;
}

// delta-encode sorted ids in place then varint (caller composes); here
// we provide fused helpers for the id-list codec.
size_t nn_delta_encode_ids(const uint64_t* ids, size_t n, uint8_t* out) {
    size_t o = 0;
    uint64_t prev = 0;
    for (size_t i = 0; i < n; i++) {
        uint64_t v = ids[i] - prev;
        prev = ids[i];
        while (v >= 0x80) {
            out[o++] = (uint8_t)(v | 0x80);
            v >>= 7;
        }
        out[o++] = (uint8_t)v;
    }
    return o;
}

size_t nn_delta_decode_ids(const uint8_t* buf, size_t size,
                           uint64_t* out, size_t max_n) {
    size_t n = nn_varint_decode(buf, size, out, max_n);
    if (n == (size_t)-1) return n;
    uint64_t acc = 0;
    for (size_t i = 0; i < n; i++) {
        acc += out[i];
        out[i] = acc;
    }
    return n;
}

// ---------------------------------------------------------------------
// byte RLE: [count u8][byte] pairs
// ---------------------------------------------------------------------
size_t nn_rle_encode(const uint8_t* buf, size_t size, uint8_t* out) {
    size_t o = 0, i = 0;
    while (i < size) {
        uint8_t b = buf[i];
        size_t run = 1;
        while (i + run < size && buf[i + run] == b && run < 255) run++;
        out[o++] = (uint8_t)run;
        out[o++] = b;
        i += run;
    }
    return o;
}

// Returns decoded size, or (size_t)-1 if out_cap too small / bad input.
size_t nn_rle_decode(const uint8_t* buf, size_t size,
                     uint8_t* out, size_t out_cap) {
    if (size % 2) return (size_t)-1;
    size_t o = 0;
    for (size_t i = 0; i < size; i += 2) {
        size_t run = buf[i];
        if (o + run > out_cap) return (size_t)-1;
        std::memset(out + o, buf[i + 1], run);
        o += run;
    }
    return o;
}

}  // extern "C"
