// Clean-room stand-in for sketch/hash.h (dnbaker/sketch; empty submodule).
// Required surface, from call sites:
//   encoder.h:47  using FRev64 = sketch::hash::CEIFused<
//                     CEIXOR<0x533f8c2151b20f97>, CEIMul<0x9a98567ed20c127d>,
//                     RotL<31>, CEIXOR<0x691a9d706391077a>>;
//                 (CEIXOR/CEIMul/RotL reached unqualified via
//                  `using namespace sketch;` at encoder.h:26)
//   encoder.h:50  sketch::hash::CEHasher()(u128)
// CEIFused applies its stages LEFT TO RIGHT — the same reconstruction
// bonsai_tpu.core.hashes.frev64 pins (the upstream source is absent from
// the checkout, so windowed-Lex parity tests validate this reconstruction,
// not the lost original; for w==k no scoring runs at all).
#ifndef REFBUILD_STUB_SKETCH_HASH_H
#define REFBUILD_STUB_SKETCH_HASH_H
#include <cstdint>

// sketch/common.h (absent) provides CONST_IF; encoder.h uses it for
// compile-time KmerT-width dispatch.
#ifndef CONST_IF
#  define CONST_IF(x) if constexpr (x)
#endif

namespace sketch {
inline namespace hash {

using u128s = __uint128_t;

template<std::uint64_t X>
struct CEIXOR {
    constexpr std::uint64_t operator()(std::uint64_t v) const { return v ^ X; }
    constexpr u128s operator()(u128s v) const {
        return v ^ ((u128s(X) << 64) | X);
    }
};
template<std::uint64_t M>
struct CEIMul {
    constexpr std::uint64_t operator()(std::uint64_t v) const { return v * M; }
    constexpr u128s operator()(u128s v) const { return v * M; }
};
template<int R>
struct RotL {
    constexpr std::uint64_t operator()(std::uint64_t v) const {
        return (v << (R & 63)) | (v >> (64 - (R & 63)));
    }
    constexpr u128s operator()(u128s v) const {
        return (v << (R & 127)) | (v >> (128 - (R & 127)));
    }
};

template<typename... Fs> struct CEIFused;
template<typename F>
struct CEIFused<F> {
    template<typename T> constexpr T operator()(T v) const { return F()(v); }
};
template<typename F, typename... Rest>
struct CEIFused<F, Rest...> {
    template<typename T> constexpr T operator()(T v) const {
        return CEIFused<Rest...>()(F()(v));
    }
};

// Canonical invertible-chain hasher used only for the u128 lex score
// (encoder.h:48-50); UNVERIFIABLE against the empty submodule.  Uses the
// same constant chain as FRev64, widened to 128 bits.
struct CEHasher {
    constexpr std::uint64_t operator()(std::uint64_t v) const {
        return CEIFused<CEIXOR<0x533f8c2151b20f97>, CEIMul<0x9a98567ed20c127d>,
                        RotL<31>, CEIXOR<0x691a9d706391077a>>()(v);
    }
    constexpr u128s operator()(u128s v) const {
        return CEIFused<CEIXOR<0x533f8c2151b20f97>, CEIMul<0x9a98567ed20c127d>,
                        RotL<31>, CEIXOR<0x691a9d706391077a>>()(v);
    }
};

} // namespace hash
} // namespace sketch
#endif
