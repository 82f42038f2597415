// Clean-room stand-in for sketch/exception.h (dnbaker/sketch; empty
// submodule).  Required surface, from call sites:
//   encoder.h:684  throw NotImplementedError("...")  (unqualified inside
//                  bns via `using namespace sketch;`)
// The original sketch/common.h also dragged in x86 intrinsics and hedley
// macros that bonsai headers (bitcmp.h:20-44, flextree.h:232) rely on;
// provide them here since this header is on every include chain.
#ifndef REFBUILD_STUB_SKETCH_EXCEPTION_H
#define REFBUILD_STUB_SKETCH_EXCEPTION_H
#include <stdexcept>
#include <string>
#if defined(__x86_64__) || defined(__i386__)
#  include <immintrin.h>
#endif

#ifndef HEDLEY_FALL_THROUGH
#  define HEDLEY_FALL_THROUGH [[fallthrough]]
#endif

namespace sketch {
inline namespace exception {
struct NotImplementedError: public std::runtime_error {
    using std::runtime_error::runtime_error;
};
} // namespace exception
} // namespace sketch
#endif
