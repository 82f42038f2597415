/* Clean-room stand-in for libpopcnt.h (vendored under the empty hll/
 * submodule).  Required surface (popcnt.h:7 + vec_popcnt call sites):
 *   uint64_t popcnt(const void *data, uint64_t nbytes);
 */
#ifndef REFBUILD_STUB_LIBPOPCNT_H
#define REFBUILD_STUB_LIBPOPCNT_H
#include <stdint.h>
#include <string.h>

static inline uint64_t popcnt(const void *data, uint64_t nbytes) {
    const unsigned char *p = (const unsigned char *)data;
    uint64_t cnt = 0, w;
    while (nbytes >= 8) {
        memcpy(&w, p, 8);
        cnt += (uint64_t)__builtin_popcountll(w);
        p += 8; nbytes -= 8;
    }
    while (nbytes--) cnt += (uint64_t)__builtin_popcount(*p++);
    return cnt;
}
#endif
