// Clean-room stand-in for circularqueue/cq.h (vendored under the empty
// hll/ submodule).  Required surface, from call sites:
//   qmap.h:38,63-87   circ::deque<ElScore, u32>: ctor(n), emplace_back()->&,
//                     pop_front()->value, size(), clear(), resize(), moves
//   entropy.h:11-42   circ::deque<char>: ctor(n), push(c), pop()->value,
//                     clear(), copy ctor
// The original is a growable ring buffer; a std::deque wrapper preserves
// the FIFO semantics exactly (capacity hints are ignored).
#ifndef REFBUILD_STUB_CIRC_CQ_H
#define REFBUILD_STUB_CIRC_CQ_H
#include <cstdint>
#include <deque>
#include <utility>

namespace circ {

template<typename T, typename SizeType = std::uint32_t>
class deque {
    std::deque<T> q_;
public:
    using size_type = SizeType;
    deque(size_type = 0) {}
    deque(const deque &) = default;
    deque(deque &&) = default;
    deque &operator=(const deque &) = default;
    deque &operator=(deque &&) = default;
    template<typename... Args>
    T &emplace_back(Args &&...args) {
        q_.emplace_back(std::forward<Args>(args)...);
        return q_.back();
    }
    void push_back(const T &v) { q_.push_back(v); }
    void push(const T &v) { q_.push_back(v); }
    T pop_front() { T v = q_.front(); q_.pop_front(); return v; }
    T pop() { return pop_front(); }
    size_type size() const { return (size_type)q_.size(); }
    bool empty() const { return q_.empty(); }
    void clear() { q_.clear(); }
    void resize(size_type) {}  // capacity hint only
    T &operator[](size_type i) { return q_[i]; }
    const T &operator[](size_type i) const { return q_[i]; }
    auto begin() { return q_.begin(); }
    auto end() { return q_.end(); }
    auto begin() const { return q_.begin(); }
    auto end() const { return q_.end(); }
};

} // namespace circ
#endif
