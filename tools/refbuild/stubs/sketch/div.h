// Clean-room stand-in for sketch/div.h (dnbaker/sketch; empty submodule).
// Required surface, from call sites (encoder.h:243,261-263 etc.):
//   schism::Schismatic<T> div(mask);  div.mod(x) == x % mask
// The original is a fast-division-by-runtime-constant; exact plain
// division is used here (this is an oracle build, not a hot path).
#ifndef REFBUILD_STUB_SKETCH_DIV_H
#define REFBUILD_STUB_SKETCH_DIV_H
#include <cstdint>

namespace schism {

template<typename T>
struct Schismatic {
    T d_;
    explicit Schismatic(T d): d_(d) {}
    T mod(T x) const { return x % d_; }
    T div(T x) const { return x / d_; }
};

} // namespace schism
#endif
