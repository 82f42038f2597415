// Clean-room stand-in for ska::flat_hash_map (vendored under the empty
// hll/ submodule).  Only in-process container behavior is consumed
// (entropy.h counts, kmeridx.h map, ssi.h map); std::unordered_map provides
// it.  NOTE: iteration order differs from the original — CircusEnt::value()
// sums doubles in iteration order, so Entropy-scored minimizer ties could
// in principle differ; documented in tools/refbuild/README.md.
#ifndef REFBUILD_STUB_SKA_FLAT_HASH_MAP_HPP
#define REFBUILD_STUB_SKA_FLAT_HASH_MAP_HPP
#include <unordered_map>
#include <unordered_set>

namespace ska {

template<typename K, typename V, typename H = std::hash<K>,
         typename E = std::equal_to<K>>
using flat_hash_map = std::unordered_map<K, V, H, E>;

template<typename K, typename H = std::hash<K>, typename E = std::equal_to<K>>
using flat_hash_set = std::unordered_set<K, H, E>;

} // namespace ska
#endif
