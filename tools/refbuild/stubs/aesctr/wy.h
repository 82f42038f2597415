// Clean-room stand-in for aesctr/wy.h (empty submodule in the reference
// checkout).  Required surface, from call sites:
//   util.h:107       using RNGType = wy::WyHash<uint64_t, 8>;
//   encoder.h:93-95  RNGType gen(seedseed); uint64_t a = gen(), ...
//   diskarray.h:21   bns::RNGType gen(nbytes); gen() fills junk bytes
// Implements the published wyrand recurrence (Wang Yi, public domain):
//   state += 0xA0761D6478BD642F
//   t      = (state ^ 0xE7037ED1A0B428DB) * state   (128-bit)
//   out    = hi(t) ^ lo(t)
#ifndef REFBUILD_STUB_WY_H
#define REFBUILD_STUB_WY_H
#include <cstdint>
#include <limits>

namespace wy {

template<typename T = std::uint64_t, unsigned BUFSZ = 8>
class WyHash {
    std::uint64_t state_;
public:
    using result_type = T;
    explicit WyHash(std::uint64_t seed = 0): state_(seed) {}
    void seed(std::uint64_t s) { state_ = s; }
    std::uint64_t next64() {
        state_ += 0xA0761D6478BD642FULL;
        __uint128_t t = (__uint128_t)(state_ ^ 0xE7037ED1A0B428DBULL) * state_;
        return (std::uint64_t)(t >> 64) ^ (std::uint64_t)t;
    }
    result_type operator()() { return (result_type)next64(); }
    static constexpr result_type min() { return std::numeric_limits<result_type>::min(); }
    static constexpr result_type max() { return std::numeric_limits<result_type>::max(); }
};

// rollinghash/characterhash.h:69,96,116 uses wy::WyRand<uint64_t> with the
// same recurrence (the CharacterHash seed stream bonsai_tpu.core.rolling
// reproduces).
template<typename T = std::uint64_t, unsigned BUFSZ = 0>
using WyRand = WyHash<T, BUFSZ>;

} // namespace wy
#endif
