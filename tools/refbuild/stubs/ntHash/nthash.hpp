// Clean-room stand-in for ntHash/nthash.hpp (empty submodule in the
// reference checkout).  Required surface, from call sites:
//   encoder.h:382  hv = NTC64(s_ + i, k, fhv, rhv);        (window init)
//   encoder.h:391  hv = NTC64(s_[i], newc, k, fhv, rhv);   (roll one base)
// Implements the published ntHash v1 recurrence (Mohamadi et al. 2016)
// with the published per-base seed values; identical semantics to
// bonsai_tpu.core.rolling's nthash mode (buzhash closed form).
#ifndef REFBUILD_STUB_NTHASH_HPP
#define REFBUILD_STUB_NTHASH_HPP
#include <cstdint>
#include <cstddef>

namespace {

constexpr std::uint64_t NT_SEED_A = 0x3C8BFBB395C60474ULL;
constexpr std::uint64_t NT_SEED_C = 0x3193C18562A02B4CULL;
constexpr std::uint64_t NT_SEED_G = 0x20323ED082572324ULL;
constexpr std::uint64_t NT_SEED_T = 0x295549F54BE24456ULL;

inline std::uint64_t nt_rol(std::uint64_t v, unsigned s) {
    s &= 63u;
    return s ? (v << s) | (v >> (64 - s)) : v;
}
inline std::uint64_t nt_ror(std::uint64_t v, unsigned s) {
    s &= 63u;
    return s ? (v >> s) | (v << (64 - s)) : v;
}

struct NTSeedTables {
    std::uint64_t fwd[256];  // seed of the base itself
    std::uint64_t rc[256];   // seed of the complement base
    NTSeedTables() {
        for (int i = 0; i < 256; ++i) fwd[i] = rc[i] = 0;
        auto set = [&](char a, char b, std::uint64_t sf, std::uint64_t sr) {
            fwd[(unsigned char)a] = fwd[(unsigned char)b] = sf;
            rc[(unsigned char)a] = rc[(unsigned char)b] = sr;
        };
        set('A', 'a', NT_SEED_A, NT_SEED_T);
        set('C', 'c', NT_SEED_C, NT_SEED_G);
        set('G', 'g', NT_SEED_G, NT_SEED_C);
        set('T', 't', NT_SEED_T, NT_SEED_A);
    }
};
inline const NTSeedTables &nt_tables() {
    static const NTSeedTables t;
    return t;
}

// Forward-strand init: h = XOR_j rol^{k-1-j}(seed[s_j]).
inline std::uint64_t NTF64(const char *kmerSeq, unsigned k) {
    std::uint64_t h = 0;
    const auto &t = nt_tables();
    for (unsigned i = 0; i < k; ++i)
        h = nt_rol(h, 1) ^ t.fwd[(unsigned char)kmerSeq[i]];
    return h;
}
// Reverse-complement init: h = XOR_j rol^{j}(seed[comp(s_j)]).
inline std::uint64_t NTR64(const char *kmerSeq, unsigned k) {
    std::uint64_t h = 0;
    const auto &t = nt_tables();
    for (unsigned i = 0; i < k; ++i)
        h ^= nt_rol(t.rc[(unsigned char)kmerSeq[i]], i);
    return h;
}
// Rolling updates.
inline std::uint64_t NTF64(std::uint64_t fhVal, unsigned k,
                           unsigned char charOut, unsigned char charIn) {
    const auto &t = nt_tables();
    return nt_rol(fhVal, 1) ^ nt_rol(t.fwd[charOut], k) ^ t.fwd[charIn];
}
inline std::uint64_t NTR64(std::uint64_t rhVal, unsigned k,
                           unsigned char charOut, unsigned char charIn) {
    const auto &t = nt_tables();
    return nt_ror(rhVal ^ t.rc[charOut], 1) ^ nt_rol(t.rc[charIn], k - 1);
}
// Canonical init + roll (the two call forms the reference uses).
inline std::uint64_t NTC64(const char *kmerSeq, unsigned k,
                           std::uint64_t &fhVal, std::uint64_t &rhVal) {
    fhVal = NTF64(kmerSeq, k);
    rhVal = NTR64(kmerSeq, k);
    return rhVal < fhVal ? rhVal : fhVal;
}
inline std::uint64_t NTC64(unsigned char charOut, unsigned char charIn,
                           unsigned k, std::uint64_t &fhVal, std::uint64_t &rhVal) {
    fhVal = NTF64(fhVal, k, charOut, charIn);
    rhVal = NTR64(rhVal, k, charOut, charIn);
    return rhVal < fhVal ? rhVal : fhVal;
}

} // namespace
#endif
