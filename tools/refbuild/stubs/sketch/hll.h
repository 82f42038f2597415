// Clean-room stand-in for sketch/hll.h (dnbaker/sketch; empty submodule).
// Required surface, from call sites (bin/bonsai.cpp:26-105, encoder.h:1097):
//   hll::hll_t(np, EstimationMethod, JointEstimationMethod)
//   .addh(u64) .report() .clone() .size() .not_ready() operator+=
// Used ONLY to presize the build-phase hash table — never affects database
// content — so a plain HyperLogLog (wang-hash mixer, standard
// bias-corrected estimator with linear counting) stands in for the
// original's Ertl-MLE estimator.
#ifndef REFBUILD_STUB_SKETCH_HLL_H
#define REFBUILD_STUB_SKETCH_HLL_H
#include <cstdint>
#include <cmath>
#include <stdexcept>
#include <vector>

namespace hll {

enum EstimationMethod: uint8_t { ORIGINAL = 0, ERTL_IMPROVED = 1, ERTL_MLE = 2 };
enum JointEstimationMethod: uint8_t { J_ORIGINAL = 0, ERTL_JOINT_MLE = 3 };

class hll_t {
    unsigned p_;
    std::vector<uint8_t> regs_;
public:
    explicit hll_t(unsigned p = 23,
                   EstimationMethod = ERTL_MLE,
                   JointEstimationMethod = ERTL_JOINT_MLE)
        : p_(p), regs_(size_t(1) << p, 0) {}
    static uint64_t mix(uint64_t k) {  // Thomas Wang 64-bit mix (hash.h:32-41)
        k = (~k) + (k << 21); k ^= k >> 24;
        k = (k + (k << 3)) + (k << 8); k ^= k >> 14;
        k = (k + (k << 2)) + (k << 4); k ^= k >> 28;
        k += k << 31;
        return k;
    }
    void add(uint64_t h) {
        const size_t idx = h >> (64 - p_);
        const uint64_t rest = h << p_;
        const uint8_t rank = rest ? uint8_t(__builtin_clzll(rest) + 1)
                                  : uint8_t(64 - p_ + 1);
        if (rank > regs_[idx]) regs_[idx] = rank;
    }
    void addh(uint64_t v) { add(mix(v)); }
    double report() const {
        const double m = double(regs_.size());
        double sum = 0.;
        size_t zeros = 0;
        for (uint8_t r : regs_) { sum += std::ldexp(1., -int(r)); zeros += !r; }
        const double alpha = m == 16 ? 0.673 : m == 32 ? 0.697
                           : m == 64 ? 0.709 : 0.7213 / (1. + 1.079 / m);
        double est = alpha * m * m / sum;
        if (est <= 2.5 * m && zeros)
            est = m * std::log(m / double(zeros));
        return est;
    }
    hll_t clone() const { return *this; }
    size_t size() const { return regs_.size(); }
    void not_ready() {}
    void csum() {}
    hll_t &operator+=(const hll_t &o) {
        if (o.regs_.size() != regs_.size())
            throw std::runtime_error("hll size mismatch");
        for (size_t i = 0; i < regs_.size(); ++i)
            if (o.regs_[i] > regs_[i]) regs_[i] = o.regs_[i];
        return *this;
    }
};

} // namespace hll
#endif
