#!/usr/bin/env python3
"""Copy a minimal set of reference headers into build/patched/ with
RUNNABILITY fixes applied, so the oracle binary can actually run.

The reference as committed cannot write or load its own database files:
`Database::write` checks `fwrite(ptr, size, nmemb)` (nmemb=1) against
`size` (database.h:99), and the load ctor makes the mirrored mistake for
`fread` (database.h:48) — both always throw for k>2.  These are upstream
bugs (the published benchmarks predate them or were run on a different
tree); the fixes below swap the size/nmemb arguments so the check is
correct.  NOTHING about k-mer, LCA, or classification semantics changes.

/root/reference is read-only and never touched; patched copies live in
the gitignored build/ directory.
"""
import os
import shutil
import sys

REF = os.environ.get("REF", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "build", "patched")

# (relative path, [(old, new), ...]) — each `old` must occur exactly once.
PATCHES = [
    (
        # classifier.h:262's slice bound reads `(per_set+1)*index` where the
        # fan-out (`chunk_size/per_set+1` work items of `per_set` reads,
        # classifier.h:276) requires `(index+1)*per_set`: as committed, each
        # work item covers reads [32i, 33i) so classify emits (almost)
        # nothing.  Reconstructed intent: item i covers [i*per_set,
        # (i+1)*per_set).
        "include/bonsai/classifier.h",
        [
            (
                "i < std::min((data->per_set_ + 1) * static_cast<unsigned>(index), data->total_);",
                "i < std::min(data->per_set_ * (static_cast<unsigned>(index) + 1), data->total_);",
            ),
            # First-batch reads have sam == NULL (kseq_declare.h:70-71) and
            # the adopting ks::string ctor immediately writes s[l]
            # (kspp/ks.h:180-183) — a null deref on every fresh batch.  Hand
            # it a writable empty buffer instead.
            (
                "ks::string bks(bs->sam, bs->l_sam);",
                "ks::string bks(bs->sam ? bs->sam : (char *)std::calloc(1, 1), bs->l_sam);",
            ),
            # output_flag_ is declared (classifier.h:137) but never
            # initialized; the ctor's set_emit_* calls OR into indeterminate
            # bits, so the output-format switch matches nothing at -O2
            # (stack garbage) and classify emits zero bytes.
            (
                "nt_(num_threads > 0 ? (uint16_t)(num_threads): (uint16_t)std::thread::hardware_concurrency())\n    {",
                "nt_(num_threads > 0 ? (uint16_t)(num_threads): (uint16_t)std::thread::hardware_concurrency()),\n        output_flag_(0)\n    {",
            ),
        ],
    ),
    (
        # build_name_hash (util.h:703-717) calls kh_put with the WHOLE line
        # ("name\tTAXID\n") — khash computes the bucket from that string —
        # and only afterwards swaps in the tab-truncated key.  Every
        # get_taxid lookup (which probes the bare name, util.h:898-929) then
        # misses and every genome is assigned taxid 1.  Terminate the name
        # before the put so the hash covers the key alone; atoi(p+1) still
        # reads the taxid that follows the (now NUL) tab byte.
        "include/bonsai/util.h",
        [
            (
                "        p = ::bns::strchrnul(buf, '\\t');\n        ki = kh_put(name, ret, buf, &khr);",
                "        p = ::bns::strchrnul(buf, '\\t');\n        if(*p) *p = '\\0';\n        ki = kh_put(name, ret, buf, &khr);",
            ),
        ],
    ),
    (
        "include/bonsai/database.h",
        [
            (
                "if(std::fread(s_.data(), s_.size(), sizeof(uint8_t), fp) != s_.size() * sizeof(uint8_t))",
                "if(std::fread(s_.data(), sizeof(uint8_t), s_.size(), fp) != s_.size())",
            ),
            (
                "if(std::fwrite(s_.data(), s_.size(), sizeof(uint8_t), ofp) != s_.size()) throw",
                "if(std::fwrite(s_.data(), sizeof(uint8_t), s_.size(), ofp) != s_.size()) throw",
            ),
        ],
    ),
]


def main() -> int:
    # Mirror the whole header dir: headers use `#pragma once`, and the
    # quote-include rule would otherwise mix patched and original copies of
    # the same header (includer-relative resolution), double-defining types.
    srcdir = os.path.join(REF, "include", "bonsai")
    dstdir = os.path.join(OUT, "include", "bonsai")
    os.makedirs(dstdir, exist_ok=True)
    patched = {rel: subs for rel, subs in PATCHES}
    for name in sorted(os.listdir(srcdir)):
        if not (name.endswith(".h") or name.endswith(".hpp")):
            continue
        rel = f"include/bonsai/{name}"
        src = os.path.join(srcdir, name)
        dst = os.path.join(dstdir, name)
        subs = patched.pop(rel, None)
        if subs is None:
            shutil.copyfile(src, dst)
            continue
        with open(src) as fh:
            text = fh.read()
        for old, new in subs:
            n = text.count(old)
            if n != 1:
                sys.stderr.write(f"patch_ref: pattern x{n} (want 1) in {rel}:\n  {old}\n")
                return 1
            text = text.replace(old, new)
        with open(dst, "w") as fh:
            fh.write(text)
        print(f"patched {rel} -> {dst}")
    if patched:
        sys.stderr.write(f"patch_ref: unmatched patch targets: {list(patched)}\n")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
