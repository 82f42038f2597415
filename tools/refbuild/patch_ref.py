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
        # encoder.h's hash_score (the score::Hash phase-1 lookup) has an
        # inverted found-test (== kh_end on the *hit* path) and a fallback
        # scan whose unguarded `return` yields slot 0's value for every
        # query — TAX_DEPTH/FEATURE_COUNT minimization reads garbage.
        # Reconstructed intent: return the phase-1 value for present keys.
        "include/bonsai/encoder.h",
        [
            (
                """    if(likely((k1 = kh_get(64, hash, i)) == kh_end(hash))) return kh_val(hash, k1);
    for(k1 = 0; k1 != kh_end(hash); ++k1) {
        LOG_DEBUG("Did not find key. Scanning.\\n");
        if(kh_key(hash, k1) == i) __ac_set_isdel_false(hash->flags, k1);
        return kh_val(hash, k1);
    }""",
                """    if(likely((k1 = kh_get(64, hash, i)) != kh_end(hash))) return kh_val(hash, k1);
    // Missing keys are the canonical(OVERFLOW)==0 sentinels of all-N
    // windows (phase 1 skips N seeds): give them the worst score so they
    // never win a window that has any scorable seed.
    return UINT64_MAX;""",
            ),
        ],
    ),
    (
        # update_td_map's fresh-insert branch (feature_min.h:230-250) packs
        # kh_val(kc, ki) — the *destination* table indexed by the *source
        # set's* iterator, i.e. garbage — instead of the genome's taxid, and
        # its merge branch feeds the full TDencode()d value to lca() as if
        # it were a taxid.  update_feature_counter (feature_min.h:251-265)
        # packs node_depth() where its own FMencode macro expects the taxid,
        # never increments the count, and likewise feeds the packed value to
        # lca().  Reconstructed intent per the TD*/FM* macros.
        "include/bonsai/feature_min.h",
        [
            (
                "kh_val(kc, k2) = TDencode(node_depth(tax, kh_val(kc, ki)), kh_val(kc, ki));",
                "kh_val(kc, k2) = TDencode(node_depth(tax, taxid), taxid);",
            ),
            (
                """            } else if(kh_val(kc, k2) != taxid) {
                do val = lca(tax, taxid, kh_val(kc, k2));""",
                """            } else if(TDtax(kh_val(kc, k2)) != taxid) {
                do val = lca(tax, taxid, TDtax(kh_val(kc, k2)));""",
            ),
            (
                "kh_val(kc, k2) = FMencode(1, node_depth(tax, taxid));",
                "kh_val(kc, k2) = FMencode(1, taxid);",
            ),
            (
                "} else while(!kh_try_set(64, kc, k2, FMencode(FMcount(kh_val(kc, k2)), lca(tax, taxid, kh_val(kc, k2)))));",
                "} else while(!kh_try_set(64, kc, k2, FMencode(FMcount(kh_val(kc, k2)) + 1, lca(tax, taxid, FMtax(kh_val(kc, k2))))));",
            ),
            # update_minimized_map aborts on any emitted key absent from the
            # phase-1 map — but all-N windows legitimately emit the
            # canonical(OVERFLOW)==0 sentinel (phase 1 skips N seeds), so
            # `build -t/-f` could never run on genomes containing any N.
            # Skip unscorable sentinels instead.
            (
                """        if(unlikely((kif = kh_get(64, full_map, kh_key(set, ki))) == kh_end(full_map)))
            LOG_EXIT("Missing kmer from database... Check for matching spacer and kmer size.\\n");""",
                """        if(unlikely((kif = kh_get(64, full_map, kh_key(set, ki))) == kh_end(full_map)))
            continue;""",
            ),
        ],
    ),
    (
        # kh_set (khash64.h:381-393) discards the iterator kh_put returns
        # for a fresh key, leaving ki == kh_end(h): the value CAS then
        # writes vals[n_buckets] — out of bounds — and the inserted key
        # keeps the calloc'd 0 value (every minimized-map entry comes out
        # as taxid 0).
        "include/bonsai/khash64.h",
        [
            (
                "\t\tif((ki = kh_get_##name(h, key)) == kh_end(h)) kh_put_##name(h, key, &khr);\\",
                "\t\tif((ki = kh_get_##name(h, key)) == kh_end(h)) ki = kh_put_##name(h, key, &khr);\\",
            ),
        ],
    ),
    (
        # kseq_assign (kseq_declare.h:177-185) re-targets a reused parser at
        # a new file but leaves ->last_char from the previous file, so the
        # record scanner skips its '>'-search and corrupts the first record
        # (the make_map farm loses ~900 kmers over the 5 ec genomes).
        # klib's own kseq_rewind zeroes last_char; do the same.
        "include/bonsai/kseq_declare.h",
        [
            (
                "        ks->f->is_eof = ks->f->begin = ks->f->end = 0;\n    }\n    ks->f->f = fp;",
                "        ks->f->is_eof = ks->f->begin = ks->f->end = 0;\n    }\n    ks->last_char = 0;\n    ks->f->f = fp;",
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
        # make_map's daemon loop (feature_min.h:134-155) resubmits the next
        # genome into the SAME khash counter it is about to fold into the
        # result (concurrent writer + reader = data race), never clears the
        # counter between genomes (later genomes fold the UNION of every
        # genome that reused the slot), and drops the final daemon-loop
        # update when `submitted == todo`.  Reorder to the evident intent:
        # fold the finished genome's set, clear the counter, then reuse it.
        "include/bonsai/feature_min.h",
        [
            (
                """            auto &f(*it);
            const size_t index(f.get());
            if(submitted == todo) break;
            if(used.find(index) != used.end()) continue;
            used.insert(index);
            const auto coffset = counter_map.at(index);
            khash_t(all) *counter = counters.data() + coffset; // Pointer to the counter to use
            kseq_t *ks_to_submit = kseqs.data() + coffset;
            f = std::async(
              std::launch::async, fill_set_genome<ScoreType>, fns[submitted].data(),
              sp, counter, submitted, (void *)data, canon, ks_to_submit);
            counter_map.emplace_back(coffset);
            ++submitted, ++completed;
            LOG_DEBUG("Have now submitted %zu element\\n", submitted);
            const tax_t taxid(get_taxid(fns[index].data(), name_hash));
            mu.update(tax_map, counter, data, r32, r64, taxid);""",
                """            auto &f(*it);
            const size_t index(f.get());
            const auto coffset = counter_map.at(index);
            khash_t(all) *counter = counters.data() + coffset; // Pointer to the counter to use
            const tax_t taxid(get_taxid(fns[index].data(), name_hash));
            mu.update(tax_map, counter, data, r32, r64, taxid);
            ++completed;
            kh_clear(all, counter);
            if(submitted < todo) {
                kseq_t *ks_to_submit = kseqs.data() + coffset;
                f = std::async(
                  std::launch::async, fill_set_genome<ScoreType>, fns[submitted].data(),
                  sp, counter, submitted, (void *)data, canon, ks_to_submit);
                counter_map.emplace_back(coffset);
                ++submitted;
                LOG_DEBUG("Have now submitted %zu element\\n", submitted);
            }""",
            ),
            # The join loop indexes `counters` by GENOME index where the
            # farm's counters are indexed by counter slot (counter_map):
            # any reused slot reads past the end of the counters vector —
            # the last genome's k-mers are silently dropped (or the build
            # segfaults).
            (
                "        const size_t index(f.get());\n        const tax_t taxid(get_taxid(fns[index].data(), name_hash));\n        mu.update(tax_map, counters.data() + index, data, r32, r64, taxid);",
                "        const size_t index(f.get());\n        const tax_t taxid(get_taxid(fns[index].data(), name_hash));\n        mu.update(tax_map, counters.data() + counter_map.at(index), data, r32, r64, taxid);",
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


# bin/ sources, patched by the same rules (copied to build/patched/bin/).
BIN_PATCHES = [
    (
        # phase2_main's mode test reads `mode == LEX || score_scheme::ENTROPY`
        # (bin/bonsai.cpp:236) — the bare enum constant ENTROPY (== 1) makes
        # the condition always true, so `build -t` / `build -f` never reach
        # the minimized-map branch and instead run an entropy lca_map that
        # OVERWRITES the phase-1 database passed as the first positional arg.
        "bin/bonsai.cpp",
        [
            (
                "if(score_scheme::LEX == mode || score_scheme::ENTROPY) {",
                "if(score_scheme::LEX == mode || score_scheme::ENTROPY == mode) {",
            ),
            # phase1_main decrements db.s_ once more before writing
            # (bin/bonsai.cpp:341-345) even though Database(Spacer) already
            # stored sub1() gaps — a contiguous seed's spacing bytes wrap to
            # 255 and every phase-1 consumer (phase2_main reads s_ as plain
            # gaps) misparses the seed.  Store the same sub1() form phase2
            # databases use.
            (
                """    for(auto &i: db.s_) {
        LOG_DEBUG("Decrementing value %i to %i\\n", i, i - 1);
        --i;
    }
""",
                "",
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
    patched = {}
    for rel, subs in PATCHES:  # multiple entries per file merge
        patched.setdefault(rel, []).extend(subs)
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
    for rel, subs in BIN_PATCHES:
        src = os.path.join(REF, rel)
        dst = os.path.join(OUT, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
