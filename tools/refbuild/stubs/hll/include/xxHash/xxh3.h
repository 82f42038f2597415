/* Clean-room stand-in for xxHash/xxh3.h (vendored under the empty hll/
 * submodule).  Required surface (counter.h:25-52):
 *   uint64_t XXH64(const void *p, size_t len, uint64_t seed);
 * Only drives in-process unordered-container layout (vector-key hashing in
 * count::Counter) — never serialized — so a wyhash-style fold stands in
 * for the real xxHash64.
 */
#ifndef REFBUILD_STUB_XXH3_H
#define REFBUILD_STUB_XXH3_H
#include <stdint.h>
#include <stddef.h>
#include <string.h>

static inline uint64_t XXH64(const void *data, size_t len, uint64_t seed) {
    const unsigned char *p = (const unsigned char *)data;
    uint64_t h = seed ^ (0xA0761D6478BD642FULL * (uint64_t)len);
    uint64_t w;
    while (len >= 8) {
        memcpy(&w, p, 8);
        __uint128_t t = (__uint128_t)(w ^ 0xE7037ED1A0B428DBULL) * (h += 0xA0761D6478BD642FULL);
        h = (uint64_t)(t >> 64) ^ (uint64_t)t;
        p += 8; len -= 8;
    }
    w = 0;
    if (len) memcpy(&w, p, len);
    {
        __uint128_t t = (__uint128_t)(w ^ 0xE7037ED1A0B428DBULL) * (h += 0xA0761D6478BD642FULL);
        h = (uint64_t)(t >> 64) ^ (uint64_t)t;
    }
    return h;
}
#endif
