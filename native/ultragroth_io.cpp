// Native host-side runtime for ultragroth_tpu.
//
// TPU-native re-implementation of the reference's C++ IO layer:
//   - mmap zero-copy file loading       (ref: src/fileloader.cpp:23-51)
//   - iden3 binfile section scanning    (ref: src/binfile_utils.cpp:32-80)
//   - Keccak-256 (FIPS202 permutation)  (ref: src/keccak256.cpp)
//   - wire-word <-> limb-plane repacking: the [N,8] u32 -> [16,N] 16-bit
//     limb-plane shuffle that feeds every device upload.  This transpose is
//     the hot host-side path for multi-GB zkeys, so it is threaded.
//
// Exposed as a plain C ABI consumed via ctypes (ultragroth_tpu/native.py);
// pure-numpy fallbacks exist for every entry point.
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// mmap file loading
// ---------------------------------------------------------------------------

void *ug_load_file(const char *path, uint64_t *size_out) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
    void *ptr = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (ptr == MAP_FAILED) return nullptr;
    madvise(ptr, st.st_size, MADV_SEQUENTIAL);
    *size_out = (uint64_t)st.st_size;
    return ptr;
}

void ug_unload_file(void *ptr, uint64_t size) {
    if (ptr) munmap(ptr, size);
}

// ---------------------------------------------------------------------------
// binfile container scan: magic[4] ver:u32 n:u32 then (type:u32,size:u64,..)*
// ---------------------------------------------------------------------------

struct UgSection { uint32_t type; uint64_t offset; uint64_t size; };

int64_t ug_binfile_scan(const uint8_t *data, uint64_t size,
                        UgSection *sections, uint64_t max_sections,
                        uint32_t *version_out) {
    if (size < 12) return -1;
    uint32_t version, n;
    memcpy(&version, data + 4, 4);
    memcpy(&n, data + 8, 4);
    if (version_out) *version_out = version;
    uint64_t pos = 12, count = 0;
    for (uint32_t i = 0; i < n; i++) {
        if (pos + 12 > size) return -1;
        uint32_t type; uint64_t ssize;
        memcpy(&type, data + pos, 4);
        memcpy(&ssize, data + pos + 4, 8);
        pos += 12;
        if (ssize > size - pos) return -1;  // overflow-safe bounds check
        if (count < max_sections) {
            sections[count].type = type;
            sections[count].offset = pos;
            sections[count].size = ssize;
        }
        count++;
        pos += ssize;
    }
    return (int64_t)count;
}

// ---------------------------------------------------------------------------
// limb repacking: [N, words] u32 <-> [2*words, N] 16-bit planes (in u32)
// ---------------------------------------------------------------------------

static void words_to_planes_range(const uint32_t *words, uint64_t n,
                                  uint64_t n_words, uint32_t *planes,
                                  uint64_t begin, uint64_t end) {
    for (uint64_t i = begin; i < end; i++) {
        const uint32_t *src = words + i * n_words;
        for (uint64_t w = 0; w < n_words; w++) {
            uint32_t v = src[w];
            planes[(2 * w) * n + i] = v & 0xFFFF;
            planes[(2 * w + 1) * n + i] = v >> 16;
        }
    }
}

void ug_words_to_planes(const uint32_t *words, uint64_t n, uint64_t n_words,
                        uint32_t *planes, int n_threads) {
    if (n_threads <= 1 || n < (1u << 16)) {
        words_to_planes_range(words, n, n_words, planes, 0, n);
        return;
    }
    std::vector<std::thread> ts;
    uint64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
        uint64_t b = t * chunk, e = std::min(n, b + chunk);
        if (b >= e) break;
        ts.emplace_back(words_to_planes_range, words, n, n_words, planes, b, e);
    }
    for (auto &t : ts) t.join();
}

void ug_planes_to_words(const uint32_t *planes, uint64_t n, uint64_t n_words,
                        uint32_t *words) {
    for (uint64_t i = 0; i < n; i++) {
        uint32_t *dst = words + i * n_words;
        for (uint64_t w = 0; w < n_words; w++) {
            dst[w] = (planes[(2 * w) * n + i] & 0xFFFF)
                   | (planes[(2 * w + 1) * n + i] << 16);
        }
    }
}

// ---------------------------------------------------------------------------
// Keccak-256 (pre-FIPS 0x01 padding), public Keccak-f[1600] spec
// ---------------------------------------------------------------------------

static const uint64_t KRC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static inline uint64_t rol64(uint64_t x, unsigned n) {
    return (x << n) | (x >> (64 - n));
}

static void keccak_f1600(uint64_t st[25]) {
    static const unsigned r[5][5] = {{0, 36, 3, 41, 18},
                                     {1, 44, 10, 45, 2},
                                     {62, 6, 43, 15, 61},
                                     {28, 55, 25, 21, 56},
                                     {27, 20, 39, 8, 14}};
    for (int round = 0; round < 24; round++) {
        uint64_t c[5], d[5], b[5][5];
        for (int x = 0; x < 5; x++)
            c[x] = st[x] ^ st[x + 5] ^ st[x + 10] ^ st[x + 15] ^ st[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rol64(c[(x + 1) % 5], 1);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                b[y][(2 * x + 3 * y) % 5] = rol64(st[x + 5 * y] ^ d[x], r[x][y]);
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                st[x + 5 * y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y]);
        st[0] ^= KRC[round];
    }
}

void ug_keccak256(const uint8_t *in, uint64_t len, uint8_t out[32]) {
    uint64_t st[25];
    memset(st, 0, sizeof(st));
    const uint64_t rate = 136;  // 1088 bits
    uint64_t off = 0;
    while (len - off >= rate) {
        for (uint64_t i = 0; i < rate / 8; i++) {
            uint64_t lane;
            memcpy(&lane, in + off + 8 * i, 8);
            st[i] ^= lane;
        }
        keccak_f1600(st);
        off += rate;
    }
    uint8_t block[136];
    memset(block, 0, sizeof(block));
    memcpy(block, in + off, len - off);
    block[len - off] = 0x01;
    block[rate - 1] |= 0x80;
    for (uint64_t i = 0; i < rate / 8; i++) {
        uint64_t lane;
        memcpy(&lane, block + 8 * i, 8);
        st[i] ^= lane;
    }
    keccak_f1600(st);
    memcpy(out, st, 32);
}

}  // extern "C"
